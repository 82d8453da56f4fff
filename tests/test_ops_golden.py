"""Golden unit tests mirroring the reference's testthat suite
(reference tests/testthat/test_infer_cnv.R) — same fixture matrices, same
expected outputs, checked against the TPU-native ops.

The reference orientation is [genes, cells]; our canonical layout is
[cells, genes], so fixtures are transposed at the boundary.
"""

import numpy as np
import pytest

from infercnv_tpu.ops import transforms as T
from infercnv_tpu.ops.smoothing import smooth_by_chromosome, smooth_window_reference
from infercnv_tpu.core.genome import GeneOrder, order_reduce


def single_chr_order(num_genes, chr_name="chr1"):
    return GeneOrder(
        names=tuple(f"g{i}" for i in range(num_genes)),
        chr_names=(chr_name,),
        chr_ids=np.zeros(num_genes, np.int32),
        start=np.arange(1, num_genes + 1),
        stop=np.arange(1, num_genes + 1),
    )


# ---------------------------------------------------------------------------
# subtract_ref (test_infer_cnv.R:89-151)
# fixtures: matrices are [cells, genes] already t()'d as in the R tests
# ---------------------------------------------------------------------------

def _subtract(mat_cg, ref_groups, use_bounds=True):
    """mat_cg: [C, G]; ref_groups: list of cell-index lists."""
    M = T.group_onehot([np.asarray(g) for g in ref_groups], mat_cg.shape[0])
    means = T.ref_group_gene_means(mat_cg, M)
    return np.asarray(T.subtract_ref_expr(mat_cg, means, use_bounds=use_bounds))


def test_subtract_ref_one_obs_one_ref():
    # R: make_fake_infercnv_obj(t(matrix_one)) -> 1 gene x 5 cells; our [C, G]
    # layout equals the untransposed R fixture (cells as rows).
    mat = np.arange(1, 6, dtype=np.float32).reshape(1, 5).T  # [5 cells, 1 gene]
    out = _subtract(mat, [[0]])
    np.testing.assert_allclose(out, np.arange(0, 5, dtype=np.float32).reshape(5, 1), rtol=1e-5, atol=1e-5)


def test_subtract_ref_two_obs_one_ref():
    mat = np.arange(1, 11, dtype=np.float32).reshape(2, 5).T  # [5 cells, 2 genes]
    out = _subtract(mat, [[0]])
    exp = np.stack([np.arange(0, 5), np.arange(0, 5)], axis=1).astype(np.float32)
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-5)


def test_subtract_ref_three_obs_two_ref():
    mat = np.arange(1, 16, dtype=np.float32).reshape(3, 5).T  # [5 cells, 3 genes]
    out = _subtract(mat, [[0, 2]])
    exp = np.stack([np.arange(-1, 4)] * 3, axis=1).astype(np.float32)
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-5)


def test_subtract_ref_five_obs_two_ref():
    mat = np.arange(1, 26, dtype=np.float32).reshape(5, 5).T  # [5 cells, 5 genes]
    out = _subtract(mat, [[1, 4]])
    exp = np.tile((np.arange(-3, 2) + 0.5).reshape(5, 1), (1, 5)).astype(np.float32)
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-5)


def test_subtract_ref_zeros():
    mat = np.zeros((5, 1), np.float32)
    out = _subtract(mat, [[0]])
    np.testing.assert_allclose(out, np.zeros((5, 1), np.float32), rtol=1e-5, atol=1e-5)


def test_subtract_ref_multigroup_bounds():
    # matrix_averef_five (test_infer_cnv.R:92-111): matrix(c(ten 5-vectors),
    # ncol=5) fills 50 values column-major into 10 rows x 5 cols; the R test
    # then transposes to 5 genes x 10 cells.  Our [C, G] layout is the
    # untransposed 10x5 R matrix: 10 cells, 5 genes.
    vals = np.array([
        -101, -100, -100, -100, -99,
        -101, -100, -99, -98, -99,
        1, 1, 2, 3, 0,
        110, 103, 90, 80, 70,
        0, 0, 0, 0, 0,
        100, 102, 100, 102, 102,
        0, -1, -4, -1, -1,
        105, 95, 80, 97, 80,
        100, 99, 100, 101, 100,
        0, 0, 0, 0, 0,
    ], np.float32)
    mat_cg = vals.reshape(10, 5, order="F")  # [10 cells, 5 genes]
    out = _subtract(mat_cg, [[1], [3, 5, 7], [9]])
    expected_rows_gc = np.array([
        [-1, 0, 0, 0, 0, -1, 0, 0, 1, 0],
        [0, 0, 0, 0, -1, 40, 33, 20, 10, 0],
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        [0, 0, -3, 0, 0, 25, 15, 0, 17, 0],
        [1, 0, 1, 2, 1, 0, 0, 0, 0, 0],
    ], np.float32)  # [5 genes, 10 cells] as in the R expected answer
    np.testing.assert_allclose(out, expected_rows_gc.T, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# center_columns (test_infer_cnv.R:156-172)
# ---------------------------------------------------------------------------

def test_center_columns_mean():
    # center_sm_3 = matrix(1:21, ncol=3): 7 genes x 3 cells; our layout [3, 7]
    x = np.arange(1, 22, dtype=np.float32).reshape(3, 7)
    out = np.asarray(T.center_cells(x, method="mean"))
    exp = np.tile(np.arange(-3, 4, dtype=np.float32), (3, 1))
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-5)


def test_center_columns_median():
    x = np.array([[1, 2, 10.0]])
    out = np.asarray(T.center_cells(x, method="median"))
    np.testing.assert_allclose(out, np.array([[-1, 0, 8.0]]), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# below_min_mean_expr_cutoff (test_infer_cnv.R:175-219)
# fixtures matrix_one (5 genes x 1 cell), matrix_three (5 genes x 3 cells)
# ---------------------------------------------------------------------------

matrix_one_cg = np.arange(1, 6, dtype=np.float32).reshape(1, 5)  # [1 cell, 5 genes]
matrix_three_cg = np.arange(1, 16, dtype=np.float32).reshape(3, 5)  # [3 cells, 5 genes]


@pytest.mark.parametrize("mat,cutoff,expected", [
    (matrix_one_cg, 10, [0, 1, 2, 3, 4]),
    (matrix_three_cg, 10, [0, 1, 2, 3]),
    (matrix_one_cg, 2, [0]),
    (matrix_three_cg, 8.4, [0, 1, 2]),
    (matrix_one_cg, 0, []),
    (matrix_three_cg, 100, [0, 1, 2, 3, 4]),
])
def test_below_min_mean_expr_cutoff(mat, cutoff, expected):
    np.testing.assert_array_equal(T.below_min_mean_expr_cutoff(mat, cutoff),
                                  np.array(expected, np.int64))


# ---------------------------------------------------------------------------
# clear_noise (test_infer_cnv.R:222-262)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mat,threshold,expected", [
    (matrix_one_cg, 0, matrix_one_cg),
    (matrix_one_cg, 4, np.array([[0, 0, 0, 4, 5]], np.float32)),
    (matrix_one_cg, 6, np.zeros((1, 5), np.float32)),
    (matrix_three_cg, 0, matrix_three_cg),
    (matrix_three_cg, 12, np.where(matrix_three_cg < 12, 0, matrix_three_cg)),
    (matrix_three_cg, 100, np.zeros((3, 5), np.float32)),
])
def test_clear_noise(mat, threshold, expected):
    np.testing.assert_allclose(np.asarray(T.clear_noise(mat, threshold)), expected, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# remove_tails (test_infer_cnv.R:265-304) — R indices are 1-based; ours 0-based
# ---------------------------------------------------------------------------

def test_remove_tails():
    r = T.remove_tails_indices
    np.testing.assert_array_equal(r(np.arange(5), 0), [])
    np.testing.assert_array_equal(r(np.arange(20), 5),
                                  np.array([0, 1, 2, 3, 4, 15, 16, 17, 18, 19]))
    np.testing.assert_array_equal(r(np.arange(1, 17), 5),
                                  np.array([1, 2, 3, 4, 5, 12, 13, 14, 15, 16]))
    np.testing.assert_array_equal(r(np.arange(4, 15), 5),
                                  np.array([4, 5, 6, 7, 8, 10, 11, 12, 13, 14]))
    # tail longer than contig: tail -> floor(5/3) = 1
    np.testing.assert_array_equal(r(np.arange(5), 100), np.array([0, 4]))


# ---------------------------------------------------------------------------
# smooth_window (test_infer_cnv.R:307-360)
# NOTE: the reference test's w=5 "golden" vector is 19 long for a 20-gene
# input — values from an older implementation, shifted by one (its test uses
# non-asserting isTRUE(all.equal(...))).  The current R code's formula equals
# conv(x,k)/conv(1,k); the golden entries align with positions 2..20 of that,
# which we assert here, plus full equality between our MXU banded-matmul path
# and the exact float64 host implementation.
# ---------------------------------------------------------------------------

matrix_one_long_2 = np.array([1, 2, 4, 7, 9, 11, 12, 14, 17, 19, 16, 14,
                              13, 11, 10, 7, 6, 4, 3, 1], np.float64)
R_GOLDEN_W5 = np.array([2.88, 4.44, 6.67, 8.78, 10.67, 12.44, 14.44, 16.11,
                        16.78, 16, 14.44, 12.78, 11.11, 9.44, 7.56, 5.89,
                        4.22, 3.13, 2.17])


def test_smooth_window_reference_matches_R_golden():
    sm = smooth_window_reference(matrix_one_long_2.reshape(-1, 1), 5)[:, 0]
    np.testing.assert_allclose(np.round(sm[1:], 2), R_GOLDEN_W5, atol=0.011)


def test_smooth_window_first_position():
    # position 1 with w=5: (1*3 + 2*2 + 4*1) / 6
    sm = smooth_window_reference(matrix_one_long_2.reshape(-1, 1), 5)[:, 0]
    np.testing.assert_allclose(sm[0], 11.0 / 6.0, rtol=1e-5, atol=1e-5)


def test_smooth_banded_matches_reference_impl():
    go = single_chr_order(20)
    x_cg = np.stack([matrix_one_long_2, matrix_one_long_2])  # 2 cells
    out = np.asarray(smooth_by_chromosome(x_cg, go, window_length=5))
    exp = smooth_window_reference(matrix_one_long_2.reshape(-1, 1), 5)[:, 0]
    np.testing.assert_allclose(out, np.stack([exp, exp]), rtol=1e-5, atol=1e-5)


def test_smooth_multichromosome_no_leakage():
    # two chromosomes: smoothing must not cross the boundary
    G = 30
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=("chr1", "chr2"),
        chr_ids=np.array([0] * 12 + [1] * 18, np.int32),
        start=np.arange(G), stop=np.arange(G),
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, G))
    out = np.asarray(smooth_by_chromosome(x, go, window_length=7))
    exp1 = smooth_window_reference(x[:, :12].T, 7).T
    exp2 = smooth_window_reference(x[:, 12:].T, 7).T
    np.testing.assert_allclose(out[:, :12], exp1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[:, 12:], exp2, rtol=1e-5, atol=1e-5)


def test_smooth_window_larger_than_chr():
    # n=5, w=101 -> triangular truncated; middle = full-array weighted mean
    go = single_chr_order(5)
    x = np.arange(1, 6, dtype=np.float64).reshape(1, 5)
    out = np.asarray(smooth_by_chromosome(x, go, window_length=101))
    exp = smooth_window_reference(x.T, 101).T
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-5)


def test_smooth_window_lt2_identity():
    go = single_chr_order(5)
    x = np.arange(1, 6, dtype=np.float64).reshape(1, 5)
    out = np.asarray(smooth_by_chromosome(x, go, window_length=1))
    np.testing.assert_allclose(out, x, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# remove_outliers_norm (test_infer_cnv.R:404-433)
# ---------------------------------------------------------------------------

def test_remove_outliers_hard_bounds_noop():
    x = np.arange(1, 21, dtype=np.float32).reshape(4, 5)  # [4 cells, 5 genes]
    out = np.asarray(T.remove_outliers_norm(x, lower_bound=-1, upper_bound=30))
    np.testing.assert_allclose(out, x, rtol=1e-5, atol=1e-5)


def test_remove_outliers_hard_bounds_clamp():
    x = np.arange(1, 21, dtype=np.float32).reshape(4, 5)
    out = np.asarray(T.remove_outliers_norm(x, lower_bound=5, upper_bound=15))
    np.testing.assert_allclose(out, np.clip(x, 5, 15), rtol=1e-5, atol=1e-5)


def test_remove_outliers_average_bound():
    # remove_outlier_norm_in_2: 4 cells of 15 genes (R: 15x4 genes x cells)
    c1 = np.arange(1, 16, dtype=np.float32)
    c2 = np.array([-5, -4] + list(range(3, 14)) + [21, 26], np.float32)
    x = np.stack([c1, c2, c1, c1])  # [4 cells, 15 genes]
    out = np.asarray(T.remove_outliers_norm(x, out_method="average_bound"))
    exp2 = np.array([-0.5, -0.5] + list(range(3, 14)) + [17.75, 17.75], np.float32)
    np.testing.assert_allclose(out[0], c1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[1], exp2, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[2], c1, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# order_reduce (test_infer_cnv.R:436-486)
# ---------------------------------------------------------------------------

def test_order_reduce_happy_path():
    expr = np.tile(np.arange(1, 11, dtype=np.float64).reshape(10, 1), (1, 2))
    gene_names = [f"gene_{i}" for i in range(1, 11)]
    # gene order table rows (R order_reduce_pos_1): genes 10,5,8,3,4,9,1,7,6,2
    order_genes = [10, 5, 8, 3, 4, 9, 1, 7, 6, 2]
    chrs = [1, 1, 2, 2, 3, 3, 4, 4, 5, 5]
    starts = [1, 5, 1, 5, 1, 5, 1, 5, 1, 5]
    stops = [4, 9, 4, 9, 4, 9, 4, 9, 4, 9]
    table = {f"gene_{g}": (str(c), s, e) for g, c, s, e in zip(order_genes, chrs, starts, stops)}
    out_expr, go, rows = order_reduce(expr, gene_names, table, ["1", "2", "3", "4", "5"])
    np.testing.assert_array_equal(out_expr[:, 0], np.array(order_genes, np.float64))
    assert list(go.names) == [f"gene_{g}" for g in order_genes]
    np.testing.assert_array_equal(go.chr_ids, np.array(chrs) - 1)


def test_order_reduce_drop_genes():
    expr = np.tile(np.arange(1, 11, dtype=np.float64).reshape(10, 1), (1, 2))
    gene_names = [f"gene_{i}" for i in range(1, 11)]
    order_genes = [10, 5, 3, 9, 1, 7]
    chrs = [1, 1, 2, 3, 4, 4]
    starts = [1, 5, 5, 5, 1, 5]
    stops = [4, 9, 9, 9, 4, 9]
    table = {f"gene_{g}": (str(c), s, e) for g, c, s, e in zip(order_genes, chrs, starts, stops)}
    out_expr, go, rows = order_reduce(expr, gene_names, table, ["1", "2", "3", "4"])
    np.testing.assert_array_equal(out_expr[:, 0], np.array(order_genes, np.float64))


def test_order_reduce_no_match_raises():
    expr = np.ones((3, 2))
    with pytest.raises(ValueError):
        order_reduce(expr, ["a", "b", "c"], {"X": ("1", 1, 2)}, ["1"])


# ---------------------------------------------------------------------------
# average bounds helper
# ---------------------------------------------------------------------------

def test_get_average_bounds():
    x = np.array([[1, 2, 3], [4, 5, 6.0]], np.float32)
    lo, hi = T.get_average_bounds(x)
    assert float(lo) == pytest.approx(2.5)
    assert float(hi) == pytest.approx(4.5)


def test_merged_gene_filter_equals_sequential():
    """Step 2 now removes both filter sets in one pass; per-gene locality
    means the surviving set must equal the reference's sequential filters
    (require_above_min_mean_expr_cutoff then require_above_min_cells_ref,
    inferCNV_ops.R:2128-2213)."""
    import numpy as np

    from infercnv_tpu.ops import transforms as T

    rng = np.random.default_rng(9)
    x = rng.poisson(0.9, (40, 200)).astype(np.float32)
    x[:, :30] = 0  # fully silent genes
    x[:3, 30:40] = 5  # expressed in too few cells but above mean cutoff?
    # sequential (reference semantics)
    d1 = T.below_min_mean_expr_cutoff(x, 1.0)
    x_seq = np.delete(x, d1, axis=1)
    d2 = T.genes_below_min_cells_ref(x_seq, 3)
    x_seq = np.delete(x_seq, d2, axis=1)
    # merged (pipeline step 2)
    drop1 = T.below_min_mean_expr_cutoff(x, 1.0)
    drop2 = np.setdiff1d(T.genes_below_min_cells_ref(x, 3), drop1)
    x_one = np.delete(x, np.union1d(drop1, drop2), axis=1)
    np.testing.assert_array_equal(x_one, x_seq)
