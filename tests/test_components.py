"""Tests for auxiliary components: median filter, newick, metadata export,
sampling, per-chr HMM."""

import numpy as np
import pytest

from infercnv_tpu.core.genome import GeneOrder
from infercnv_tpu.core.object import InferCNV
from infercnv_tpu.ops.median_filter import _median_filter_block, apply_median_filtering
from infercnv_tpu.report.newick import linkage_to_newick
from infercnv_tpu.report.regions import CnvRegion, GroupRegions
from infercnv_tpu.report.seurat_export import compute_cnv_features
from infercnv_tpu.viz.per_group import sample_object


def median_filter_naive(data, window_size):
    """Literal loop transcription of the reference .median_filter
    (noise_reduction.R:92-113)."""
    half = (window_size - 1) // 2
    xdim, ydim = data.shape
    out = data.copy()
    for posx in range(1, xdim + 1):
        posxa = 1 if posx <= half + 1 else posx - (half + 1)
        posxb = xdim if posx >= xdim - (half + 1) else posx + (half + 1)
        for posy in range(1, ydim + 1):
            posya = 1 if posy <= half + 1 else posy - (half + 1)
            posyb = ydim if posy >= ydim - (half + 1) else posy + (half + 1)
            out[posx - 1, posy - 1] = np.median(
                data[posxa - 1:posxb, posya - 1:posyb])
    return out


@pytest.mark.parametrize("shape", [(20, 9), (8, 8), (30, 3)])
def test_median_filter_matches_reference_loop(shape, rng):
    data = rng.normal(size=shape)
    got = _median_filter_block(data, 7)
    exp = median_filter_naive(data, 7)
    np.testing.assert_allclose(got, exp)


def _small_obj(rng, C=12, G=20):
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=("chr1", "chr2"),
        chr_ids=np.array([0] * (G // 2) + [1] * (G - G // 2), np.int32),
        start=np.arange(1, G + 1) * 100, stop=np.arange(1, G + 1) * 100 + 50,
    )
    expr = rng.normal(1, 0.1, (C, G)).astype(np.float32)
    obj = InferCNV(
        expr=expr, counts=expr.copy(), gene_order=go,
        cell_names=[f"c{i}" for i in range(C)],
        ref_groups={"normal": np.arange(0, 4)},
        obs_groups={"tumor": np.arange(4, C)},
    )
    obj.tumor_subclusters = {
        "subclusters": {
            "tumor": {"tumor_s1": np.arange(4, 8), "tumor_s2": np.arange(8, C)},
            "normal": {"normal_s1": np.arange(0, 4)},
        },
        "hc": {},
    }
    return obj


def test_apply_median_filtering_smoke(rng):
    obj = _small_obj(rng)
    before = obj.expr.copy()
    apply_median_filtering(obj, window_size=3)
    assert obj.expr.shape == before.shape
    assert not np.allclose(obj.expr, before)  # something was smoothed
    # median filtering reduces within-block variance
    assert obj.expr.std() < before.std()


def test_linkage_to_newick():
    from scipy.cluster import hierarchy

    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 3))
    Z = hierarchy.linkage(x, method="ward")
    nwk = linkage_to_newick(Z, [f"leaf{i}" for i in range(5)])
    assert nwk.endswith(";")
    assert nwk.count("(") == 4  # n-1 internal nodes
    for i in range(5):
        assert f"leaf{i}" in nwk


def test_compute_cnv_features(rng):
    obj = _small_obj(rng)
    regions = [GroupRegions(
        group_name="tumor_s1",
        cells=[f"c{i}" for i in range(4, 8)],
        regions=[
            CnvRegion(name="chr1-region_1", state=2, chrom="chr1",
                      start=100, end=550,
                      genes=[f"g{i}" for i in range(5)],
                      gene_states=[2] * 5,
                      gene_starts=list(range(100, 600, 100)),
                      gene_stops=list(range(150, 650, 100))),
            CnvRegion(name="chr2-region_2", state=5, chrom="chr2",
                      start=1100, end=1550,
                      genes=[f"g{i}" for i in range(10, 15)],
                      gene_states=[5] * 5,
                      gene_starts=list(range(1100, 1600, 100)),
                      gene_stops=list(range(1150, 1650, 100))),
        ],
    )]
    feats, order = compute_cnv_features(obj, regions, hmm_type="i6")
    cells_s1 = np.arange(4, 8)
    assert feats["has_loss_chr1"][cells_s1].all()
    assert not feats["has_loss_chr1"][np.arange(0, 4)].any()
    assert feats["has_dupli_chr2"][cells_s1].all()
    np.testing.assert_allclose(feats["proportion_loss_chr1"][cells_s1], 0.5)
    # scaled: |2-3|*5 genes / (10 genes * 2)
    np.testing.assert_allclose(feats["proportion_scaled_loss_chr1"][cells_s1], 0.25)
    # dupli scaled: (5-3)*5 / (10*2) = 0.5
    np.testing.assert_allclose(feats["proportion_scaled_dupli_chr2"][cells_s1], 0.5)
    assert feats["top_loss_1"][cells_s1].all()
    assert feats["top_dupli_1"][cells_s1].all()


def test_sample_object(rng):
    obj = _small_obj(rng, C=40)
    obj.tumor_subclusters = {
        "subclusters": {"tumor": {"tumor_s1": np.arange(4, 30),
                                  "tumor_s2": np.arange(30, 40)}},
        "hc": {},
    }
    sub = sample_object(obj, n_cells=6, above_m=5, on_references=False)
    assert sub.num_cells < obj.num_cells
    # every subcluster keeps at least one member
    subs = sub.tumor_subclusters["subclusters"]["tumor"]
    assert all(len(v) >= 1 for v in subs.values())
    sub.validate()


def test_bh_adjust_matches_r():
    from infercnv_tpu.ops.de_mask import bh_adjust

    p = np.array([0.01, 0.02, 0.03, 0.5, 0.9])
    # R: p.adjust(p, 'BH') = 0.050, 0.050, 0.050, 0.625, 0.900
    np.testing.assert_allclose(bh_adjust(p), [0.05, 0.05, 0.05, 0.625, 0.9])


def test_row_median_exact(rng):
    from infercnv_tpu.ops.median import row_median

    for n in (5, 6, 101, 256):
        x = rng.normal(size=(17, n)).astype(np.float32)
        got = np.asarray(row_median(x))
        exp = np.median(x, axis=1)
        np.testing.assert_array_equal(got, exp)
    # with duplicates and negatives
    x = np.array([[1.0, 1.0, -2.0, -2.0], [0.0, 0.0, 0.0, 5.0]], np.float32)
    np.testing.assert_array_equal(np.asarray(row_median(x)), np.median(x, axis=1))


def test_sample_object_upsamples_small_groups(rng):
    """Reference upsampling branch (infercnv_sampling.R:170-244): groups
    below n_cells are duplicated up to EXACTLY n_cells with _k renames."""
    obj = _small_obj(rng, C=40)
    obj.tumor_subclusters = {
        "subclusters": {"tumor": {"tumor_s1": np.arange(4, 30),
                                  "tumor_s2": np.arange(30, 40)}},
        "hc": {},
    }
    up = sample_object(obj, n_cells=10)  # normal group has only 4 cells
    assert up.ref_groups["normal"].size == 10
    assert up.obs_groups["tumor"].size == 10
    names = [up.cell_names[i] for i in up.ref_groups["normal"]]
    # every upsampled cell is renamed <cell>_<copy>
    assert all("_" in n for n in names)
    assert len(set(names)) == 10
    # 10 = 4 cells x 2 copies + 2 extras
    bases = sorted(n.rsplit("_", 1)[0] for n in names)
    assert len(set(bases)) == 4
    # duplicated rows carry identical expression
    src = {obj.cell_names[i]: obj.expr[i] for i in obj.ref_groups["normal"]}
    for i in up.ref_groups["normal"]:
        base = up.cell_names[i].rsplit("_", 1)[0]
        np.testing.assert_array_equal(up.expr[i], src[base])
    up.validate()


def test_sample_object_every_n_above_m(rng):
    """every_n/above_m mode (infercnv_sampling.R:100-167): groups above
    above_m keep 1-in-every_n plus one cell per unrepresented subcluster;
    smaller groups pass through untouched."""
    obj = _small_obj(rng, C=40)
    obj.tumor_subclusters = {
        "subclusters": {"tumor": {"tumor_s1": np.arange(4, 37),
                                  "tumor_s2": np.arange(37, 40)}},
        "hc": {},
    }
    sub = sample_object(obj, every_n=5, above_m=10)
    # normal (4 cells) <= above_m: untouched
    assert sub.ref_groups["normal"].size == 4
    # tumor (36 cells): ceil(36/5) = 8 cells, +1 if a subcluster was missed
    t = sub.obs_groups["tumor"].size
    assert 8 <= t <= 9
    subs = sub.tumor_subclusters["subclusters"]["tumor"]
    assert all(len(v) >= 1 for v in subs.values())
    sub.validate()

    with pytest.raises(ValueError):
        sample_object(obj, every_n=1, above_m=10)
    with pytest.raises(ValueError):
        sample_object(obj, n_cells=None)


def test_sample_object_roundtrip_bundled_example(tmp_path):
    """Round-trip down- and up-sampling on the bundled example
    (VERDICT r3 item 5)."""
    from infercnv_tpu.io import load_bundled_example
    from infercnv_tpu.viz.per_group import plot_per_group

    obj = load_bundled_example()
    down = sample_object(obj, n_cells=20)
    assert all(v.size == 20 for v in down.ref_groups.values())
    assert all(v.size == 20 for v in down.obs_groups.values())
    down.validate()
    up = sample_object(down, n_cells=35)
    assert all(v.size == 35 for v in up.ref_groups.values())
    assert all(v.size == 35 for v in up.obs_groups.values())
    up.validate()
    paths = plot_per_group(up, str(tmp_path), png_res=80)
    import os

    assert len(paths) == len(up.ref_groups) + len(up.obs_groups)
    assert all(p and os.path.exists(p) for p in paths)


def test_sample_object_exact_count_with_many_subclusters(rng):
    """Downsampling hits EXACTLY n_cells even with many tiny subclusters
    (largest-remainder allocation), and falls back to plain sampling when
    subclusters outnumber the target."""
    obj = _small_obj(rng, C=120)
    obj.obs_groups = {"tumor": np.arange(4, 120)}
    subs = {f"tumor_s{i+1}": np.arange(4 + 2 * i, 6 + 2 * i)
            for i in range(58)}  # 58 subclusters of 2 cells
    obj.tumor_subclusters = {"subclusters": {"tumor": subs}, "hc": {}}
    out = sample_object(obj, n_cells=100, on_references=False)
    assert out.obs_groups["tumor"].size == 100
    # every subcluster still represented (58 <= 100)
    got = out.tumor_subclusters["subclusters"]["tumor"]
    assert len(got) == 58 and all(len(v) >= 1 for v in got.values())
    # more subclusters than target: plain sampling, still exact
    out2 = sample_object(obj, n_cells=30, on_references=False)
    assert out2.obs_groups["tumor"].size == 30


def test_median_filter_chunked_equals_full(rng):
    """The halo-chunked cell-axis streaming path is exact (memory fix for
    the (2r+1)^2 plane stack)."""
    from infercnv_tpu.ops.median_filter import (
        _median_filter_block,
        _median_filter_block_core,
    )

    data = rng.normal(size=(40, 300))
    full = _median_filter_block_core(data, 7)
    chunked = _median_filter_block(data, 7, max_plane_elems=40 * 49 * 30)
    np.testing.assert_array_equal(full, chunked)


def test_median_filter_invalid_window_raises(rng):
    from infercnv_tpu.ops.median_filter import apply_median_filtering

    obj = _small_obj(rng)
    with pytest.raises(ValueError):
        apply_median_filtering(obj, window_size=4)


def test_smoothing_spline_edge_cases():
    """Zero-weight points are dropped (no NaN poisoning), tiny data gets a
    weighted LINEAR fit, and empty input raises clearly."""
    from infercnv_tpu.utils.splines import fit_smoothing_spline

    sp = fit_smoothing_spline(np.array([0., 1, 2, 3, 4]),
                              np.array([0., 1, 2, 3, 4]),
                              w=np.array([1., 1, 0, 1, 1]))
    assert np.isfinite(sp.predict(np.array([2.0]))).all()
    sp2 = fit_smoothing_spline(np.array([0., 0, 1, 1, 2, 2]),
                               np.array([0., 1, 2, 3, 4, 5]))
    np.testing.assert_allclose(sp2.predict(np.array([0., 1, 2])),
                               [0.5, 2.5, 4.5], atol=1e-9)
    with pytest.raises(ValueError):
        fit_smoothing_spline(np.array([np.nan]), np.array([np.nan]))


def test_newick_sanitizes_reserved_characters():
    from infercnv_tpu.report.newick import linkage_to_newick
    from scipy.cluster import hierarchy

    Z = hierarchy.linkage(np.array([[0.0], [1.0], [5.0]]), method="ward")
    nwk = linkage_to_newick(Z, ["a,b", "c:d", "e (f)"])
    # reserved characters never appear inside labels
    assert "a_b" in nwk and "c_d" in nwk and "e__f_" in nwk


def test_step_timer_finish_writes_tsv(tmp_path):
    """StepTimer's full surface: step() records, finish() writes the tsv,
    as_json() serializes.  Regression: a round-5 edit accidentally nested
    finish/as_json inside a helper, so run() crashed at timer.finish()."""
    from infercnv_tpu.utils.profiling import StepTimer

    t = StepTimer(str(tmp_path))
    with t.step("03_normalize"):
        pass
    t.finish()
    lines = (tmp_path / "step_timings.tsv").read_text().strip().splitlines()
    assert lines[0] == "step\tseconds"
    assert lines[1].startswith("03_normalize\t")
    import json

    assert json.loads(t.as_json())[0]["step"] == "03_normalize"
