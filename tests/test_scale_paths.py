"""Scale-out paths: tiled kNN, mean-profile linkage, pane downsampling.

These guard the 100k-cell product path (VERDICT round-2 items 1/6): no
O(n^2) memory on the Leiden route, tiled kNN exactness, and raster-style
row aggregation for huge heatmap panes."""

import numpy as np
import pytest

import infercnv_tpu.subcluster.distance as dist
from infercnv_tpu.subcluster.distance import knn_indices, _knn_oneshot
from infercnv_tpu.viz.heatmap import _downsample_rows, _pc1_order


def test_tiled_knn_matches_oneshot(monkeypatch):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((700, 40)).astype(np.float32)
    ref = np.asarray(_knn_oneshot(x, 10))
    # force the tiled path with a small block size
    monkeypatch.setattr(dist, "_KNN_ONESHOT_MAX", 100)
    monkeypatch.setattr(dist, "_KNN_BLOCK", 256)
    tiled = np.asarray(knn_indices(x, 10))
    # neighbor SETS must match; top_k tie order within equal distances can
    # differ between launch shapes, so compare as sorted sets per row
    assert np.array_equal(np.sort(ref, axis=1), np.sort(tiled, axis=1))


def test_tiled_knn_ragged_tail(monkeypatch):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((530, 16)).astype(np.float32)  # 530 % 256 != 0
    ref = np.asarray(_knn_oneshot(x, 5))
    monkeypatch.setattr(dist, "_KNN_ONESHOT_MAX", 100)
    monkeypatch.setattr(dist, "_KNN_BLOCK", 256)
    tiled = np.asarray(knn_indices(x, 5))
    assert tiled.shape == (530, 5)
    assert np.array_equal(np.sort(ref, axis=1), np.sort(tiled, axis=1))


def test_group_linkage_scalable_switches_to_profiles(monkeypatch):
    import infercnv_tpu.subcluster.partition as part

    rng = np.random.default_rng(2)
    n = 60
    expr = rng.standard_normal((n, 30))
    idx = np.arange(100, 100 + n)  # global indices offset from local rows
    subs = {"g_s1": idx[:20], "g_s2": idx[20:45], "g_s3": idx[45:]}
    monkeypatch.setattr(part, "LINKAGE_MAX_CELLS", 10)
    Z = part._group_linkage_scalable(expr, subs, idx)
    assert Z is not None and Z.shape == (2, 4)  # 3 profiles -> 2 merges
    # below the threshold: per-cell tree over all n cells
    monkeypatch.setattr(part, "LINKAGE_MAX_CELLS", 10_000)
    Z2 = part._group_linkage_scalable(expr, subs, idx)
    assert Z2.shape == (n - 1, 4)


def test_downsample_rows_preserves_groups_and_means():
    rng = np.random.default_rng(3)
    mat = rng.standard_normal((1000, 8)).astype(np.float32)
    sizes = [("a", 600), ("b", 300), ("c", 100)]
    out, new_sizes, down = _downsample_rows(mat, sizes, 100)
    assert down
    assert out.shape[0] == sum(s for _g, s in new_sizes) <= 110
    # proportional allocation and exact per-group mean preservation
    assert [g for g, _s in new_sizes] == ["a", "b", "c"]
    acc_in = acc_out = 0
    for (g, size), (_g2, nb) in zip(sizes, new_sizes):
        blk_in = mat[acc_in:acc_in + size]
        blk_out = out[acc_out:acc_out + nb]
        edges = np.linspace(0, size, nb + 1).astype(int)
        w = np.diff(edges).astype(np.float64)
        np.testing.assert_allclose(
            (blk_out * w[:, None]).sum(0) / size, blk_in.mean(0), atol=1e-5)
        acc_in += size
        acc_out += nb
    # no-op below the threshold
    same, same_sizes, d2 = _downsample_rows(mat, sizes, 2000)
    assert not d2 and same is mat and same_sizes == sizes


def test_pc1_order_groups_similar_rows():
    rng = np.random.default_rng(4)
    lo = rng.standard_normal((50, 20)) * 0.1 - 2.0
    hi = rng.standard_normal((50, 20)) * 0.1 + 2.0
    x = np.concatenate([lo, hi])
    perm = rng.permutation(100)
    order = _pc1_order(x[perm])
    labels = (perm >= 50).astype(int)[order]
    # after ordering, the two blocks must be contiguous (one transition)
    assert (np.abs(np.diff(labels)) > 0).sum() == 1


def test_plot_cnv_large_pane_downsamples(tmp_path):
    """A >max_pane_rows observation pane renders (quickly) via aggregation."""
    from infercnv_tpu.core.genome import GeneOrder
    from infercnv_tpu.core.object import InferCNV
    from infercnv_tpu.viz.heatmap import plot_cnv

    rng = np.random.default_rng(5)
    C, G = 600, 40
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=("chr1", "chr2"),
        chr_ids=np.repeat([0, 1], G // 2).astype(np.int32),
        start=np.arange(G), stop=np.arange(G) + 1,
    )
    obj = InferCNV(
        expr=rng.standard_normal((C, G)).astype(np.float32) + 1.0,
        counts=None, gene_order=go,
        cell_names=[f"c{i}" for i in range(C)],
        ref_groups={"ref_a": np.arange(0, 50), "ref_b": np.arange(50, 100)},
        obs_groups={"tum": np.arange(100, C)},
    )
    out = plot_cnv(obj, out_dir=str(tmp_path), output_filename="big",
                   max_pane_rows=64)
    assert out is not None
    import os
    assert os.path.exists(out)


def test_run_memmap_f16_transfer_and_lazy_slice(tmp_path, monkeypatch):
    """The 1M-scale run() options, forced on at toy size: float16 chunk
    downloads, disk-memmap residual, lazy per-group subcluster slicing and
    in-place block denoise must still call the planted CNV and keep the
    residual within f16 rounding of the default run."""
    import numpy as np

    from infercnv_tpu.runner.pipeline import run
    from infercnv_tpu.subcluster import partition as part
    from tests.test_pipeline import make_synthetic

    obj_a = make_synthetic()
    obj_b = make_synthetic()
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    kw = dict(HMM=True, HMM_type="i6", analysis_mode="subclusters",
              tumor_subcluster_partition_method="leiden", denoise=True,
              window_length=21, no_plot=True, save_rds=False,
              BayesMaxPNormal=0)
    res_a = run(obj_a, out_dir=out_a, **kw)
    # force every big-matrix path at toy size
    monkeypatch.setattr(part, "PHASE_TIMES", dict(part.PHASE_TIMES))
    res_b = run(obj_b, out_dir=out_b, engine_transfer_dtype="float16",
                residual_memmap_gb=1e-9, **kw)
    import os

    assert os.path.exists(os.path.join(out_b, "_residual.f32.memmap"))
    ea = np.asarray(res_a.infercnv_obj.expr, np.float32)
    eb = np.asarray(res_b.infercnv_obj.expr, np.float32)
    # f16 has ~5e-4 relative resolution around 1.0; values sitting exactly
    # on the denoise band edge can flip in/out of the band (difference up
    # to the band width), so assert f16-closeness in bulk + bounded tails
    d = np.abs(eb - ea)
    assert (d > 2e-3).mean() < 0.01, (d > 2e-3).mean()
    assert d.max() < 0.2, d.max()
    # identical planted-CNV structure: states agree almost everywhere
    sa, sb = np.asarray(res_a.hmm_states), np.asarray(res_b.hmm_states)
    assert (sa == sb).mean() > 0.99
