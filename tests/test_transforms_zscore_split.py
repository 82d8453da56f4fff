"""Tests for components previously untested in PARITY.md: z-score transforms,
upper-quartile normalization, split_references, random_trees partitioning,
per-chromosome HMM subclusters, and the disabled 'shc' method.

Reference semantics cited per-test (R/inferCNV_ops.R, inferCNV_tumor_subclusters.R).
"""

import numpy as np
import pytest

from infercnv_tpu.core.genome import GeneOrder
from infercnv_tpu.core.object import InferCNV
from infercnv_tpu.ops.transforms import (
    mean_center_gene_expr,
    normalize_by_upper_quartile,
    scale_infercnv_expr,
    transform_to_reference_based_zscores,
)
from infercnv_tpu.subcluster.partition import (
    define_tumor_subclusters,
    split_references,
)


# ---------------------------------------------------------------------------
# z-score transforms (inferCNV_ops.R:3174-3185, 2874-2907, 2940-2952, 3193-3212)
# ---------------------------------------------------------------------------

def test_scale_infercnv_expr_per_gene_z(rng):
    # reference: t(scale(t(expr))) — standardize each gene across cells
    x = rng.normal(3.0, 2.0, (40, 7)).astype(np.float32)
    z = np.asarray(scale_infercnv_expr(x))
    np.testing.assert_allclose(z.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(z.std(axis=0, ddof=1), 1.0, atol=1e-5)


def test_scale_infercnv_expr_constant_gene():
    # a zero-variance gene must not produce NaN (R scale divides by sd, giving
    # NaN; we guard with sd->1 so the centered column is exactly zero)
    x = np.ones((10, 3), np.float32) * 5.0
    x[:, 1] = np.arange(10)
    z = np.asarray(scale_infercnv_expr(x))
    assert np.isfinite(z).all()
    np.testing.assert_allclose(z[:, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(z[:, 2], 0.0, atol=1e-6)


def test_reference_based_zscores_poisson_floor(rng):
    # reference transform_to_reference_based_Zscores: sd floored at sqrt(mean)
    C, G = 30, 5
    x = rng.normal(10.0, 0.01, (C, G)).astype(np.float32)  # tiny empirical sd
    ref_idx = np.arange(15)
    z = np.asarray(transform_to_reference_based_zscores(x, ref_idx))
    ref = x[ref_idx].astype(np.float64)
    mu = ref.mean(axis=0)
    sd = np.maximum(ref.std(axis=0, ddof=1), np.sqrt(mu))  # floor engages: sd ~ sqrt(10)
    exp = (x - mu) / sd
    np.testing.assert_allclose(z, exp, rtol=1e-4, atol=1e-5)
    # the floor actually mattered in this construction
    assert (ref.std(axis=0, ddof=1) < np.sqrt(mu)).all()


def test_reference_based_zscores_no_floor(rng):
    # when empirical sd exceeds sqrt(mean), the plain z-score is used
    C, G = 50, 4
    x = rng.normal(1.0, 10.0, (C, G)).astype(np.float32)
    ref_idx = np.arange(25)
    z = np.asarray(transform_to_reference_based_zscores(x, ref_idx))
    ref = x[ref_idx].astype(np.float64)
    mu, sd = ref.mean(axis=0), ref.std(axis=0, ddof=1)
    sd = np.maximum(sd, np.sqrt(np.maximum(mu, 0.0)))
    np.testing.assert_allclose(z, (x - mu) / sd, rtol=1e-4, atol=1e-5)


def test_mean_center_gene_expr(rng):
    x = rng.normal(2.0, 1.0, (12, 6)).astype(np.float32)
    got = np.asarray(mean_center_gene_expr(x))
    np.testing.assert_allclose(got, x - x.mean(axis=0, keepdims=True), atol=1e-5)


def test_normalize_by_upper_quartile(rng):
    # reference cross_cell_normalize (:3193-3212): scale each cell by
    # mean(upper_quartiles)/its own 75th percentile
    x = rng.gamma(2.0, 5.0, (8, 200)).astype(np.float32)
    got = np.asarray(normalize_by_upper_quartile(x))
    uq = np.quantile(x.astype(np.float64), 0.75, axis=1, keepdims=True)
    exp = x / uq * uq.mean()
    np.testing.assert_allclose(got, exp, rtol=1e-4)
    # post-condition: every cell's upper quartile equals the common mean
    np.testing.assert_allclose(
        np.quantile(got, 0.75, axis=1), uq.mean(), rtol=1e-4)


# ---------------------------------------------------------------------------
# split_references (inferCNV_ops.R:1917-1947)
# ---------------------------------------------------------------------------

def _obj_with_two_ref_blobs(rng, n_per=8, G=30):
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=("chr1",),
        chr_ids=np.zeros(G, np.int32),
        start=np.arange(1, G + 1) * 100,
        stop=np.arange(1, G + 1) * 100 + 50,
    )
    a = rng.normal(0.0, 0.1, (n_per, G))
    b = rng.normal(5.0, 0.1, (n_per, G))
    t = rng.normal(2.5, 0.1, (4, G))
    expr = np.vstack([a, b, t]).astype(np.float32)
    return InferCNV(
        expr=expr, counts=expr.copy(), gene_order=go,
        cell_names=[f"c{i}" for i in range(expr.shape[0])],
        ref_groups={"normal": np.arange(2 * n_per)},
        obs_groups={"tumor": np.arange(2 * n_per, 2 * n_per + 4)},
    )


def test_split_references_recovers_blobs(rng):
    obj = _obj_with_two_ref_blobs(rng, n_per=8)
    split_references(obj, num_groups=2, hclust_method="complete")
    assert set(obj.ref_groups) == {"refgrp-1", "refgrp-2"}
    parts = [np.sort(v) for v in obj.ref_groups.values()]
    # the two well-separated blobs come back exactly
    joined = {tuple(p) for p in parts}
    assert joined == {tuple(range(8)), tuple(range(8, 16))}
    # partition covers all reference cells exactly once
    all_idx = np.sort(np.concatenate(parts))
    np.testing.assert_array_equal(all_idx, np.arange(16))


def test_split_references_requires_refs(rng):
    obj = _obj_with_two_ref_blobs(rng)
    obj.ref_groups = {}
    with pytest.raises(ValueError):
        split_references(obj, num_groups=2)


# ---------------------------------------------------------------------------
# random_trees partitioning (inferCNV_tumor_subclusters.R:403-531)
# ---------------------------------------------------------------------------

def _obj_planted_tumor(rng, n_ref=6, n_per=12, G=40, sep=4.0):
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=("chr1", "chr2"),
        chr_ids=np.array([0] * (G // 2) + [1] * (G - G // 2), np.int32),
        start=np.arange(1, G + 1) * 100,
        stop=np.arange(1, G + 1) * 100 + 50,
    )
    ref = rng.normal(0, 0.3, (n_ref, G))
    t1 = rng.normal(0, 0.3, (n_per, G))
    t2 = rng.normal(0, 0.3, (n_per, G))
    t2[:, : G // 2] += sep  # chr1 shifted: a clean planted split
    expr = np.vstack([ref, t1, t2]).astype(np.float32)
    return InferCNV(
        expr=expr, counts=expr.copy(), gene_order=go,
        cell_names=[f"c{i}" for i in range(expr.shape[0])],
        ref_groups={"normal": np.arange(n_ref)},
        obs_groups={"tumor": np.arange(n_ref, n_ref + 2 * n_per)},
    )


def test_random_trees_splits_planted_clusters(rng):
    obj = _obj_planted_tumor(rng)
    # window scaled to the 40-gene toy genome (the reference's fixed k=101
    # runmean would flatten it entirely — truncated windows cover all genes)
    define_tumor_subclusters(
        obj, partition_method="random_trees", p_val=0.05, seed=7,
        random_trees_window_size=7)
    subs = obj.tumor_subclusters["subclusters"]["tumor"]
    assert len(subs) >= 2
    # each planted half must live in a single subcluster (no mixed leaves)
    half1 = set(range(6, 18))
    half2 = set(range(18, 30))
    for members in subs.values():
        m = set(int(i) for i in members)
        assert m <= half1 or m <= half2, "subcluster mixes the planted halves"
    # all tumor cells partitioned exactly once
    all_m = np.sort(np.concatenate(list(subs.values())))
    np.testing.assert_array_equal(all_m, np.arange(6, 30))


def test_random_trees_homogeneous_no_split(rng):
    obj = _obj_planted_tumor(rng, sep=0.0)
    define_tumor_subclusters(
        obj, partition_method="random_trees", p_val=0.01, seed=7)
    subs = obj.tumor_subclusters["subclusters"]["tumor"]
    # homogeneous data: permutation test should not find significant structure
    assert len(subs) == 1


# ---------------------------------------------------------------------------
# per-chromosome HMM subclusters (inferCNV_tumor_subclusters.R:646-697)
# ---------------------------------------------------------------------------

def test_per_chr_hmm_subclusters_structure(rng):
    obj = _obj_planted_tumor(rng, n_per=16)
    per_chr = define_tumor_subclusters(
        obj, partition_method="leiden", leiden_method="simple", k_nn=5,
        leiden_resolution=0.1, per_chr_hmm_subclusters=True, seed=3)
    assert per_chr is not None
    assert set(per_chr) == {"chr1", "chr2"}
    tumor_idx = np.arange(6, 38)
    for cname, chr_map in per_chr.items():
        # flat map {subcluster_name: idx}: tumor groups split per-chr,
        # reference cells kept whole under their annotation name
        # (per_chr_hmm_subclusters_references=False default)
        assert "normal" in chr_map
        np.testing.assert_array_equal(np.sort(chr_map["normal"]), np.arange(6))
        tumor_parts = [v for k, v in chr_map.items() if k.startswith("tumor")]
        got = np.sort(np.concatenate(tumor_parts))
        np.testing.assert_array_equal(got, tumor_idx)
    # chr1 carries the planted split: its tumor partition must separate halves
    chr1_parts = [set(int(i) for i in v) for k, v in per_chr["chr1"].items()
                  if k.startswith("tumor")]
    half1, half2 = set(range(6, 22)), set(range(22, 38))
    assert len(chr1_parts) >= 2
    for m in chr1_parts:
        assert m <= half1 or m <= half2


# ---------------------------------------------------------------------------
# 'shc' is accepted by the arg validator but disabled (reference parity)
# ---------------------------------------------------------------------------

def test_shc_accepted_but_disabled(rng):
    from infercnv_tpu.runner.config import RunConfig

    cfg = RunConfig(tumor_subcluster_partition_method="shc")
    cfg.validate()  # match.arg accepts it (inferCNV_ops.R:286)
    obj = _obj_planted_tumor(rng)
    with pytest.raises(NotImplementedError):
        define_tumor_subclusters(obj, partition_method="shc")
