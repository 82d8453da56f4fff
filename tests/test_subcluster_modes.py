"""Coverage for the remaining subclustering / HMM modes: hclust cuts,
random_trees, split_references, per-chr HMM subclusters, removeCells."""

import numpy as np
import pytest

from infercnv_tpu.core.genome import GeneOrder
from infercnv_tpu.core.object import InferCNV
from infercnv_tpu.subcluster.partition import define_tumor_subclusters, split_references


def make_obj(rng, C=60, G=90, n_groups=2):
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=("chr1", "chr2", "chr3"),
        chr_ids=np.repeat(np.arange(3), G // 3).astype(np.int32),
        start=np.arange(G), stop=np.arange(G),
    )
    expr = rng.normal(1, 0.1, (C, G)).astype(np.float32)
    # two clearly distinct tumor subpopulations
    expr[20:40, :30] += 1.0
    expr[40:60, 30:60] -= 0.8
    obj = InferCNV(
        expr=expr, counts=expr.copy(), gene_order=go,
        cell_names=[f"c{i}" for i in range(C)],
        ref_groups={"normal": np.arange(0, 20)},
        obs_groups={"tumor": np.arange(20, C)},
    )
    return obj


@pytest.mark.parametrize("method", ["qnorm", "pheight", "qgamma", "none"])
def test_hclust_cut_methods(method, rng):
    obj = make_obj(rng)
    define_tumor_subclusters(obj, partition_method=method, z_score_filter=0,
                             p_val=0.1)
    subs = obj.tumor_subclusters["subclusters"]["tumor"]
    total = sum(len(v) for v in subs.values())
    assert total == 40
    if method == "none":
        assert len(subs) == 1
    # indices must partition the group
    allidx = np.sort(np.concatenate(list(subs.values())))
    np.testing.assert_array_equal(allidx, np.arange(20, 60))


def test_random_trees_partitions_distinct_populations(rng):
    obj = make_obj(rng)
    define_tumor_subclusters(obj, partition_method="random_trees",
                             z_score_filter=0, p_val=0.05, seed=1,
                             random_trees_window_size=11)
    subs = obj.tumor_subclusters["subclusters"]["tumor"]
    assert len(subs) >= 2  # the two planted populations separate
    allidx = np.sort(np.concatenate(list(subs.values())))
    np.testing.assert_array_equal(allidx, np.arange(20, 60))


def test_random_trees_runmean_preprocessing():
    """The pre-smoothing matches caTools::runmean(k, endrule='mean') +
    median centering (reference …random_smoothed_trees.R:71-73): literal
    truncated-window transcription vs the vectorized implementation."""
    from infercnv_tpu.subcluster.partition import runmean_median_center

    rng2 = np.random.default_rng(3)
    x = rng2.normal(size=(4, 25))
    k = 7
    h = (k - 1) // 2
    expected = np.empty_like(x)
    for c in range(x.shape[0]):
        for i in range(x.shape[1]):
            lo, hi = max(0, i - h), min(x.shape[1] - 1, i + h)
            expected[c, i] = x[c, lo:hi + 1].mean()
    expected -= np.median(expected, axis=1, keepdims=True)
    np.testing.assert_allclose(runmean_median_center(x, k), expected, atol=1e-12)


def test_random_trees_depth_and_min_size_limits():
    """max_recursion_depth=3 and min_cluster_size_recurse=10 are honored
    (reference …random_smoothed_trees.R:1-2, :130-211): a deeply nested
    planted hierarchy stops splitting at depth 3, and subclusters below 10
    cells never recurse."""
    from infercnv_tpu.subcluster.partition import _random_trees_recurse

    rng2 = np.random.default_rng(11)
    # 4-level binary hierarchy: 64 cells, signal strength decays by level so
    # each level is individually significant
    n, G = 64, 120
    x = rng2.normal(0, 0.05, (n, G))
    for level, scale in [(1, 4.0), (2, 2.0), (3, 1.0), (4, 0.5)]:
        block = n >> level
        for b in range(1 << level):
            if b % 2:
                sl = slice(b * block, (b + 1) * block)
                x[sl, (level - 1) * 30:(level) * 30] += scale
    idx = np.arange(n)
    parts = _random_trees_recurse(idx, x, p_val=0.1,
                                  rng=np.random.default_rng(0),
                                  window_size=5)
    # depth cap -> at most 2^3 = 8 leaves even though 16 exist in the data
    assert 2 <= len(parts) <= 8
    # min-size: all leaves that were split into came from >= 10-cell parents
    assert sorted(np.concatenate(parts).tolist()) == list(range(n))

    # a group smaller than min_cluster_size_recurse is never split
    small = _random_trees_recurse(np.arange(8), x[:8], p_val=1.0,
                                  rng=np.random.default_rng(0), window_size=5,
                                  min_cluster_size_recurse=10)
    # cutting happens (p_val=1 always significant) but pieces < 10 cells stop
    for leaf in small:
        assert leaf.size <= 8


def test_split_references(rng):
    obj = make_obj(rng)
    obj.expr[:10] += 2.0  # make two reference subtypes
    split_references(obj, num_groups=2)
    assert len(obj.ref_groups) == 2
    assert set(obj.ref_groups) == {"refgrp-1", "refgrp-2"}
    sizes = sorted(len(v) for v in obj.ref_groups.values())
    assert sum(sizes) == 20
    # the contrast cells should separate cleanly
    assert sizes == [10, 10]


def test_per_chr_subclusters_and_hmm(rng):
    from infercnv_tpu.models.hmm import HMMParams, predict_hmm_on_subclusters_per_chr

    obj = make_obj(rng, C=80)
    obj.obs_groups = {"tumor": np.arange(20, 80)}
    subclusters_per_chr = define_tumor_subclusters(
        obj, partition_method="leiden", leiden_method="simple",
        leiden_resolution=0.05, k_nn=10, per_chr_hmm_subclusters=True,
        z_score_filter=0, seed=3)
    assert subclusters_per_chr is not None
    assert set(subclusters_per_chr) == {"chr1", "chr2", "chr3"}
    # references appended to each chromosome's groups
    for cname, groups in subclusters_per_chr.items():
        assert "normal" in groups

    params = HMMParams(means=np.array([0.01, 0.5, 1.0, 1.5, 2.0, 3.0]),
                       sds=np.full(6, 0.15), t=1e-6)
    states = predict_hmm_on_subclusters_per_chr(obj, params, subclusters_per_chr)
    assert states.shape == obj.expr.shape
    assert set(np.unique(states)) <= set(range(1, 7))
    # planted +1.0 block on chr1 of cells 20..40 should call amplification
    assert (states[20:40, :30] > 3).mean() > 0.5


def test_remove_cells_filter(rng):
    from infercnv_tpu.models.bayes import remove_cells_filter

    obj = make_obj(rng)
    G = obj.num_genes
    states = np.full((obj.num_cells, G), 2, np.int32)  # i3 neutral
    # the HMM called a deletion (state 1) for all tumor cells on chr1, but
    # only half of them actually carry the signal
    states[20:60, 0:30] = 1
    obj.expr[20:40, 0:30] = 0.80   # carriers (near the i3 deletion mean)
    obj.expr[40:60, 0:30] = 1.0    # non-carriers mislabeled by the HMM
    out, result = remove_cells_filter(
        obj, states, hmm_type="i3", BayesMaxPNormal=0.5, hspike=None,
        report_by="consensus", max_rounds=3)
    assert result.regions, "non-neutral regions must be modeled"
    # the non-carrier cells' region should be reset to neutral
    assert (out[40:60, 0:30] == 2).mean() > 0.6
    # carriers keep the deletion call
    assert (out[20:40, 0:30] == 1).mean() > 0.6


def test_remove_cells_mode_applies_reassign_and_writes_probs(rng, tmp_path):
    """postMcmcMethod='removeCells' must still run reassignCNV afterwards
    and write CNV_State_Probabilities.dat (reference
    inferCNV_BayesNet.R:1404-1421 runs reassign for BOTH modes)."""
    from infercnv_tpu.models.bayes import bayesian_filter_states

    obj = make_obj(rng)
    G = obj.num_genes
    states = np.full((obj.num_cells, G), 2, np.int8)
    # call an AMPLIFICATION (state 3) where the data actually shows a
    # deletion: reassign must flip the region to the argmax state
    states[20:60, 0:30] = 3
    obj.expr[20:60, 0:30] = 0.75
    out, result = bayesian_filter_states(
        obj, states, hmm_type="i3", BayesMaxPNormal=0.9, hspike=None,
        reassign=True, out_dir=str(tmp_path), report_by="consensus",
        post_mcmc_method="removeCells")
    assert result.reassigned, "argmax-mismatched region must be reassigned"
    assert (out[20:60, 0:30] == 1).mean() > 0.6
    import os

    assert os.path.exists(tmp_path / "CNV_State_Probabilities.dat")
