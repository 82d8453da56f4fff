"""Regression tests on the bundled oligodendroglioma example (the
reference's correctness baseline, example/run.R:8-25): creation shape,
residual biology (the hallmark 1p/19q co-deletion), and engine/pipeline
consistency."""

import numpy as np
import pytest

from infercnv_tpu.io import load_bundled_example
from infercnv_tpu.ops import transforms as T
from infercnv_tpu.ops.smoothing import smooth_by_chromosome


@pytest.fixture(scope="module")
def example_obj():
    try:
        return load_bundled_example()
    except FileNotFoundError:
        pytest.skip("reference extdata not available")


def test_example_creation_shape(example_obj):
    obj = example_obj
    assert obj.num_genes == 9939  # post chrX/Y/M exclusion
    assert obj.num_cells == 184
    assert set(obj.ref_groups) == {"Microglia/Macrophage",
                                   "Oligodendrocytes (non-malignant)"}
    assert len(obj.obs_groups) == 4
    assert obj.gene_order.chr_names[:3] == ("chr1", "chr2", "chr3")


def test_example_residual_biology(example_obj):
    obj = example_obj.copy()
    obj.remove_genes(T.below_min_mean_expr_cutoff(obj.expr, 1.0))
    assert obj.num_genes == 8508
    x = T.normalize_counts_by_seq_depth(obj.expr)
    x = T.log2xplus1(x)
    M = T.group_onehot(list(obj.ref_groups.values()), obj.num_cells)
    x = T.subtract_ref_expr(x, T.ref_group_gene_means(x, M), use_bounds=True)
    x = T.apply_max_threshold_bounds(x, 3.0)
    x = smooth_by_chromosome(x, obj.gene_order, 101)
    x = T.center_cells(x, "median")
    x = T.subtract_ref_expr(x, T.ref_group_gene_means(x, M), use_bounds=True)
    x = np.asarray(T.invert_log2(x))

    obs = obj.all_obs_idx()
    ref = obj.all_ref_idx()
    # references stay near 1.0 everywhere
    assert abs(x[ref].mean() - 1.0) < 0.02
    # hallmark oligodendroglioma chr1p deletion: first ~half of chr1 depleted
    chr1 = obj.gene_order.chr_gene_indices("chr1")
    p_arm = chr1[: chr1.size // 2]
    assert x[np.ix_(obs, p_arm)].mean() < 0.93
    # chr19 deletion signal (q arm)
    chr19 = obj.gene_order.chr_gene_indices("chr19")
    q_arm = chr19[chr19.size // 2:]
    assert x[np.ix_(obs, q_arm)].mean() < 0.95
    # tumor cells deviate more than reference cells overall
    assert np.abs(x[obs] - 1).mean() > 1.5 * np.abs(x[ref] - 1).mean()


def test_engine_matches_pipeline_ops(example_obj):
    """The fused CnvEngine chunk must reproduce the op-by-op residual when
    there is a single pooled reference group."""
    from infercnv_tpu.models.hmm import HMMParams
    from infercnv_tpu.parallel.engine import CnvEngine, EngineConfig

    obj = example_obj.copy()
    obj.remove_genes(T.below_min_mean_expr_cutoff(obj.expr, 1.0))
    counts = obj.expr
    ref_idx = obj.all_ref_idx()
    norm_factor = float(np.median(counts.sum(axis=1)))

    hmm = HMMParams(means=np.array([0.135, 0.631, 1.0, 1.346, 1.702, 2.237]),
                    sds=np.full(6, 0.25), t=1e-6)
    engine = CnvEngine(obj.gene_order, hmm, EngineConfig())
    ml, mr, _ = engine.ref_stats(counts[ref_idx], norm_factor)
    resid_engine = np.asarray(engine.transform_chunk(counts, norm_factor, ml, mr))

    # op-by-op with ONE pooled ref group
    x = T.normalize_counts_by_seq_depth(counts, norm_factor)
    x = T.log2xplus1(x)
    M = T.group_onehot([ref_idx], obj.num_cells)
    x = T.subtract_ref_expr(x, T.ref_group_gene_means(x, M), use_bounds=True)
    x = T.apply_max_threshold_bounds(x, 3.0)
    x = smooth_by_chromosome(x, obj.gene_order, 101)
    x = T.center_cells(x, "median")
    x = T.subtract_ref_expr(x, T.ref_group_gene_means(x, M), use_bounds=True)
    resid_ops = np.asarray(T.invert_log2(x))

    np.testing.assert_allclose(resid_engine, resid_ops, rtol=2e-4, atol=2e-4)


def test_leiden_example_partition_stable_and_group_confined(example_obj):
    """Leiden on the bundled example: deterministic under a fixed seed, and
    every subcluster stays within its annotation group (no R golden exists —
    the packaged objects were generated in samples mode — so determinism +
    structure is the strongest available check; see PARITY.md)."""
    from infercnv_tpu.ops import transforms as T2
    from infercnv_tpu.subcluster.partition import define_tumor_subclusters

    def residual_obj():
        obj = example_obj.copy()
        obj.remove_genes(T2.below_min_mean_expr_cutoff(obj.expr, 1.0))
        x = T2.normalize_counts_by_seq_depth(obj.expr)
        x = T2.log2xplus1(x)
        M = T2.group_onehot(list(obj.ref_groups.values()), obj.num_cells)
        x = T2.subtract_ref_expr(x, T2.ref_group_gene_means(x, M), use_bounds=True)
        obj.expr = np.asarray(T2.invert_log2(x))
        return obj

    parts = []
    for _ in range(2):
        obj = residual_obj()
        define_tumor_subclusters(obj, partition_method="leiden", seed=12345)
        parts.append(obj.tumor_subclusters["subclusters"])
    # determinism: identical membership across runs
    assert set(parts[0]) == set(parts[1])
    for g in parts[0]:
        assert set(parts[0][g]) == set(parts[1][g])
        for name in parts[0][g]:
            np.testing.assert_array_equal(parts[0][g][name], parts[1][g][name])
    # group confinement: subcluster members come only from their group
    obj = residual_obj()
    group_of = {}
    for g, idx in {**obj.obs_groups, **obj.ref_groups}.items():
        for c in idx:
            group_of[int(c)] = g
    for g, subs in parts[0].items():
        for name, members in subs.items():
            assert {group_of[int(c)] for c in members} == {g}, name


def test_engine_subclusters_mode_matches_pipeline(example_obj, tmp_path):
    """The streaming engine in the DEFAULT analysis configuration
    (multi-ref-group bounds + subcluster-mode Viterbi with the hspike
    cell-count-trend sigma + denoise) must reproduce the full run() products
    on the bundled example with its 2 reference groups."""
    from infercnv_tpu.models import hmm as hmm_mod
    from infercnv_tpu.parallel.engine import CnvEngine, EngineConfig
    from infercnv_tpu.runner.pipeline import run

    res = run(example_obj.copy(), out_dir=str(tmp_path), cutoff=1,
              cluster_by_groups=True, denoise=True, HMM=True,
              analysis_mode="subclusters", no_plot=True, save_rds=False,
              BayesMaxPNormal=0)  # raw step-17 states for comparison
    final = res.infercnv_obj

    # engine setup from the same post-filter counts + hspike calibration
    counts = final.counts
    norm_factor = float(np.median(counts.sum(axis=1)))
    cnv_mean_sd = hmm_mod.get_spike_dists(final.hspike)
    trend_fits = hmm_mod.cnv_mean_sd_trend_fit(final.hspike, seed=12345)
    params = hmm_mod.i6_hmm_params(cnv_mean_sd, t=1e-6)
    engine = CnvEngine(final.gene_order, params,
                       EngineConfig(denoise=True, sd_amplifier=1.5))

    # multi-group reference stats (2 ref groups -> 2 bound rows)
    ref_groups = list(final.ref_groups.values())
    ref_idx = np.concatenate(ref_groups)
    onehot_ref = np.zeros((len(ref_groups), ref_idx.size), np.float32)
    pos = {c: i for i, c in enumerate(ref_idx)}
    for k, g in enumerate(ref_groups):
        onehot_ref[k, [pos[c] for c in g]] = 1.0
    ml, mr, noise = engine.ref_stats(counts[ref_idx], norm_factor, onehot_ref)
    assert ml.shape[0] == 2

    # subcluster membership from the pipeline's own leiden partition
    groups = {}
    for _g, subs in final.tumor_subclusters["subclusters"].items():
        groups.update(subs)
    names = list(groups)
    K, C = len(names), final.num_cells

    # stream in two chunks, accumulating subcluster partial sums in-program
    resid_out = np.zeros_like(final.expr)
    acc = None
    bounds_chunks = [(0, C // 2), (C // 2, C)]
    for b, e in bounds_chunks:
        onehot = np.zeros((K, e - b), np.float32)
        for k, nm in enumerate(names):
            sel = [c - b for c in groups[nm] if b <= c < e]
            onehot[k, sel] = 1.0
        r, gs, gc = engine.subcluster_chunk(counts[b:e], norm_factor, ml, mr,
                                            noise, onehot, acc=acc)
        resid_out[b:e] = np.asarray(r)
        acc = (gs, gc)
    gsum = np.asarray(acc[0], np.float64)
    gcount = np.asarray(acc[1], np.float64)

    # 1) final denoised matrix matches the pipeline's step-22 output
    np.testing.assert_allclose(resid_out, final.expr, rtol=2e-3, atol=2e-3)

    # 2) subcluster-mode Viterbi on streamed group means matches step 17
    means_rows = gsum / gcount[:, None]
    states_rows = np.asarray(engine.viterbi_group_means(
        means_rows, gcount.astype(int), trend_fits))
    states_full = np.zeros_like(res.hmm_states)
    for k, nm in enumerate(names):
        states_full[groups[nm]] = states_rows[k]
    agree = (states_full == res.hmm_states).mean()
    assert agree > 0.999, f"engine vs pipeline state agreement {agree:.5f}"
