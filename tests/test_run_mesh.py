"""Mesh-aware run(): the PRODUCT pipeline on an 8-device virtual cell mesh
must be bitwise-equal to the single-device run (VERDICT round-2 item 2).

The engine chunk transform and the step-17 Viterbi shard over the mesh
(shard_map, no cross-cell collectives in these stages); the depth-norm
factor goes through the sharded radix median.  conftest.py forces an
8-virtual-device CPU platform."""

import numpy as np
import pytest

from infercnv_tpu.core.genome import GeneOrder
from infercnv_tpu.core.object import InferCNV
from infercnv_tpu.runner.pipeline import run


def _toy_obj(num_cells=64, genes_per_chr=96, n_chr=3, seed=0):
    G = genes_per_chr * n_chr
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=tuple(f"chr{i+1}" for i in range(n_chr)),
        chr_ids=np.repeat(np.arange(n_chr), genes_per_chr).astype(np.int32),
        start=np.arange(G) * 100, stop=np.arange(G) * 100 + 50,
    )
    rng = np.random.default_rng(seed)
    lam = rng.gamma(2.0, 30.0, G)[None, :] * np.ones((num_cells, 1))
    tumor = slice(num_cells // 2, num_cells)
    lam[tumor, genes_per_chr:2 * genes_per_chr] *= 0.5     # chr2 deletion
    lam[tumor, 2 * genes_per_chr:3 * genes_per_chr] *= 2.0  # chr3 amp
    counts = rng.poisson(lam).astype(np.float32)
    half = num_cells // 2
    return InferCNV(
        expr=counts.copy(), counts=counts,
        gene_order=go, cell_names=[f"c{i}" for i in range(num_cells)],
        ref_groups={"normal_a": np.arange(0, half // 2),
                    "normal_b": np.arange(half // 2, half)},
        obs_groups={"tumor": np.arange(half, num_cells)},
    )


KW = dict(cutoff=0.1, HMM=True, denoise=True, analysis_mode="subclusters",
          window_length=21, no_plot=True, save_rds=False,
          BayesMaxPNormal=0.0,  # Bayes exercised separately (test_bayes*)
          )


@pytest.mark.parametrize("analysis_mode", ["subclusters", "cells"])
def test_run_mesh_bitwise_equals_single_device(tmp_path, analysis_mode):
    kw = dict(KW, analysis_mode=analysis_mode)
    res1 = run(_toy_obj(), out_dir=str(tmp_path / "one"), **kw)
    res8 = run(_toy_obj(), out_dir=str(tmp_path / "eight"), n_devices=8, **kw)

    # CNV state calls: bitwise.  Residuals: CPU matmul microkernels pick
    # different accumulation orders for the per-shard batch shape, so the
    # virtual mesh shows ~1-ulp (<5e-7) deltas; on TPU the MXU reduction
    # order is shape-independent.
    np.testing.assert_array_equal(res8.hmm_states, res1.hmm_states)
    np.testing.assert_allclose(res8.infercnv_obj.expr, res1.infercnv_obj.expr,
                               rtol=0, atol=1e-5)
    # the planted CNVs are actually called
    st = res8.hmm_states
    tum = res8.infercnv_obj.all_obs_idx()
    G3 = res8.infercnv_obj.num_genes // 3
    assert (st[np.ix_(tum, np.arange(G3, 2 * G3))] < 3).mean() > 0.5
    assert (st[np.ix_(tum, np.arange(2 * G3, 3 * G3))] > 3).mean() > 0.5


def test_run_mesh_uneven_cells(tmp_path):
    """Cell count not divisible by the mesh: the tail chunk pads, the
    norm factor falls back to the host median — results still identical."""
    kw = dict(KW, analysis_mode="cells")
    obj1 = _toy_obj(num_cells=60)
    obj8 = _toy_obj(num_cells=60)
    res1 = run(obj1, out_dir=str(tmp_path / "one"), **kw)
    res8 = run(obj8, out_dir=str(tmp_path / "eight"), n_devices=8, **kw)
    np.testing.assert_array_equal(res8.hmm_states, res1.hmm_states)
    np.testing.assert_allclose(res8.infercnv_obj.expr, res1.infercnv_obj.expr,
                               rtol=0, atol=1e-5)


def test_run_mesh_multichunk_streaming_equals_single_chunk(tmp_path):
    """The REASON the mesh exists: matrices bigger than one device's budget
    stream through in multiple bounded chunks.  Force 4 chunks (ragged
    tail) over the 8-device mesh via engine_chunk_cells and require the
    same results as the single-chunk whole-matrix pass."""
    obj = _toy_obj(num_cells=176)  # chunk 48 -> 4 chunks, last ragged (32)
    r_stream = run(obj.copy(), out_dir=str(tmp_path / "stream"),
                   n_devices=8, engine_chunk_cells=48, **KW)
    r_whole = run(obj.copy(), out_dir=str(tmp_path / "whole"),
                  n_devices=8, **KW)
    np.testing.assert_array_equal(
        np.asarray(r_stream.infercnv_obj.expr),
        np.asarray(r_whole.infercnv_obj.expr))
    np.testing.assert_array_equal(r_stream.hmm_states, r_whole.hmm_states)
