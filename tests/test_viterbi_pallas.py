"""Pallas Viterbi kernel vs the XLA scan path (interpret mode on CPU)."""

import numpy as np
import pytest

from infercnv_tpu.core.genome import GeneOrder
from infercnv_tpu.models.hmm import HMMParams, viterbi_per_group
from infercnv_tpu.ops.viterbi_pallas import _log_sf_std_normal, viterbi_pallas

MEANS = np.array([0.135, 0.631, 1.0, 1.346, 1.702, 2.237])
SDS = np.array([0.221, 0.252, 0.211, 0.288, 0.341, 0.457])


def test_log_sf_poly_matches_scipy():
    from scipy.stats import norm
    import jax.numpy as jnp

    z = np.linspace(0, 40, 2001)
    got = np.asarray(_log_sf_std_normal(jnp.asarray(z, jnp.float64)))
    exp = norm.logsf(z)
    np.testing.assert_allclose(got, exp, rtol=2e-6)


def test_pallas_viterbi_matches_xla(rng):
    B, L = 256, 200
    x = rng.normal(1.0, 0.25, (B, L)).astype(np.float32)
    x[10:40, 30:90] += 0.7
    x[50:90, 120:180] -= 0.5
    lengths = np.full(B, L, np.int32)
    lengths[100:140] = rng.integers(10, L, 40)
    sigma = np.full(B, np.median(SDS), np.float32)
    st_p = np.asarray(viterbi_pallas(x, lengths, sigma, MEANS, interpret=True))

    params = HMMParams(means=MEANS, sds=SDS, t=1e-6)
    # full-length rows against the XLA path
    full = lengths == L
    go = GeneOrder(names=tuple(f"g{i}" for i in range(L)), chr_names=("chr1",),
                   chr_ids=np.zeros(L, np.int32), start=np.arange(L), stop=np.arange(L))
    st_x = viterbi_per_group(x[full], go, params)
    np.testing.assert_array_equal(st_p[full], st_x)
    # truncated rows against per-row runs
    for i in range(100, 110):
        n = int(lengths[i])
        goi = GeneOrder(
            names=tuple(f"g{k}" for k in range(n)), chr_names=("chr1",),
            chr_ids=np.zeros(n, np.int32), start=np.arange(n), stop=np.arange(n))
        sti = viterbi_per_group(x[i:i + 1, :n], goi, params)
        np.testing.assert_array_equal(st_p[i, :n], sti[0])


def test_pallas_viterbi_segment_restarts(rng):
    """Chromosomes packed into one padded sequence (boundary flags) must give
    the exact same states as running each chromosome separately — the engine
    relies on this for its bin-packed layout (parallel/engine.py
    _pack_indices)."""
    B, L = 128, 240
    segs = [(0, 90), (90, 150), (150, 240)]  # 3 packed "chromosomes"
    x = rng.normal(1.0, 0.25, (B, L)).astype(np.float32)
    # plant a CNV that straddles a segment join: without a chain restart the
    # t=1e-6 transition cost drags states across the boundary
    x[:, 70:110] += 0.9
    lengths = np.full(B, L, np.int32)
    sigma = np.full(B, np.median(SDS), np.float32)
    bnd = np.zeros((B, L), np.int8)
    for (b, _e) in segs:
        bnd[:, b] = 1
    st_packed = np.asarray(
        viterbi_pallas(x, lengths, sigma, MEANS, boundaries=bnd, interpret=True))

    # per-segment runs are the ground truth
    for (b, e) in segs:
        st_seg = np.asarray(viterbi_pallas(
            x[:, b:e], np.full(B, e - b, np.int32), sigma, MEANS,
            interpret=True))
        np.testing.assert_array_equal(st_packed[:, b:e], st_seg)
