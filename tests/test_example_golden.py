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
