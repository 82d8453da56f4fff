"""HMM unit tests: Viterbi semantics vs a direct float64 implementation of
the reference algorithm (Viterbi.dthmm.adj, R/inferCNV_HMM.R:1101-1176)."""

import numpy as np
import pytest
from scipy.stats import norm

from infercnv_tpu.core.genome import GeneOrder
from infercnv_tpu.models.hmm import (
    HMMParams,
    assign_states_to_proxy_values,
    i6_hmm_params,
    viterbi_per_group,
)


def reference_viterbi(x, means, sds, t=1e-6):
    """Direct float64 transcription of the reference scoring (single seq)."""
    n = len(x)
    m = len(means)
    if n < 2:
        return np.full(n, (m - 1) // 2 + 1)
    sd = np.median(sds)
    Pi = np.full((m, m), t)
    np.fill_diagonal(Pi, 1 - (m - 1) * t)
    delta = np.full(m, t)
    delta[(m - 1) // 2] = 1 - (m - 1) * t
    logPi = np.log(Pi)

    def emission(xi):
        e = norm.logsf(np.abs(xi - means) / sd)
        e = 1.0 / (-e)
        e = e / e.sum()
        return np.log(e)

    nu = np.zeros((n, m))
    nu[0] = np.log(delta) + emission(x[0])
    for i in range(1, n):
        scores = nu[i - 1][:, None] + logPi
        nu[i] = scores.max(axis=0) + emission(x[i])
    y = np.zeros(n, np.int64)
    y[-1] = np.argmax(nu[-1])
    for i in range(n - 2, -1, -1):
        y[i] = np.argmax(logPi[:, y[i + 1]] + nu[i])
    return y + 1


def two_chr_order(n1, n2):
    G = n1 + n2
    return GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=("chr1", "chr2"),
        chr_ids=np.array([0] * n1 + [1] * n2, np.int32),
        start=np.arange(G), stop=np.arange(G),
    )


I6_PARAMS = HMMParams(
    means=np.array([0.01, 0.5, 1.0, 1.5, 2.0, 3.0]),
    sds=np.array([0.15, 0.18, 0.12, 0.2, 0.22, 0.3]),
    t=1e-6,
)


def test_viterbi_matches_reference_impl(rng):
    G = 120
    go = two_chr_order(70, 50)
    # synthetic: neutral with an amplified block and a deleted block
    x = np.full((3, G), 1.0)
    x[0, 10:30] = 1.5
    x[1, 80:100] = 0.5
    x += rng.normal(0, 0.05, x.shape)
    states = viterbi_per_group(x, go, I6_PARAMS)
    for b in range(3):
        exp1 = reference_viterbi(x[b, :70], I6_PARAMS.means, I6_PARAMS.sds)
        exp2 = reference_viterbi(x[b, 70:], I6_PARAMS.means, I6_PARAMS.sds)
        np.testing.assert_array_equal(states[b, :70], exp1)
        np.testing.assert_array_equal(states[b, 70:], exp2)


def test_viterbi_detects_planted_cnvs(rng):
    go = two_chr_order(100, 100)
    x = np.full((1, 200), 1.0) + rng.normal(0, 0.05, (1, 200))
    x[0, 20:60] += 0.5   # amplification -> state 4
    x[0, 120:160] -= 0.5  # deletion -> state 2
    states = viterbi_per_group(x, go, I6_PARAMS)
    assert (states[0, 25:55] == 4).mean() > 0.9
    assert (states[0, 125:155] == 2).mean() > 0.9
    assert (states[0, 65:95] == 3).mean() > 0.9


def test_short_chromosome_gets_neutral():
    go = GeneOrder(
        names=("a", "b", "c"), chr_names=("chr1", "chr2"),
        chr_ids=np.array([0, 0, 1], np.int32),
        start=np.arange(3), stop=np.arange(3),
    )
    x = np.array([[3.0, 3.0, 3.0]])
    states = viterbi_per_group(x, go, I6_PARAMS)
    assert states[0, 2] == 3  # single-gene chromosome -> neutral


def test_proxy_values():
    st = np.array([[1, 2, 3, 4, 5, 6]])
    np.testing.assert_allclose(
        assign_states_to_proxy_values(st, 6),
        np.array([[0.0, 0.5, 1.0, 1.5, 2.0, 3.0]]))
    st3 = np.array([[1, 2, 3]])
    np.testing.assert_allclose(
        assign_states_to_proxy_values(st3, 3), np.array([[0.5, 1.0, 1.5]]))


def test_i6_params_structure():
    cnv_mean_sd = {f"cnv:{lvl}": (float(v), 0.1 + 0.01 * i)
                   for i, (lvl, v) in enumerate(
                       zip(["0.01", "0.5", "1", "1.5", "2", "3"],
                           [0.0, 0.5, 1.0, 1.5, 2.0, 3.0]))}
    p = i6_hmm_params(cnv_mean_sd)
    assert p.num_states == 6
    d = p.delta()
    assert d.argmax() == 2  # neutral-favoring start
    P = np.exp(p.log_pi())
    np.testing.assert_allclose(P.sum(axis=1), np.ones(6), rtol=1e-6)


def test_viterbi_packed_matches_perchr():
    """The unified bin-packed hot path (step 17 now runs through it) must
    reproduce the independent per-chromosome-padded implementation exactly,
    including short (<2 gene) chromosomes and per-row sigma scaling."""
    from infercnv_tpu.core.genome import GeneOrder

    rng = np.random.default_rng(11)
    sizes = [83, 1, 190, 41, 2, 130]
    G = sum(sizes)
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=tuple(f"chr{i+1}" for i in range(len(sizes))),
        chr_ids=np.repeat(np.arange(len(sizes)), sizes).astype(np.int32),
        start=np.arange(G), stop=np.arange(G) + 1,
    )
    x = rng.normal(1.0, 0.3, (7, G)).astype(np.float32)
    x[2, 84:150] *= 0.4    # deletion-ish block inside chr3
    x[5, 274:340] *= 2.1   # amplification inside chr6
    group_sds = np.abs(rng.normal(0.25, 0.05, (7, I6_PARAMS.num_states)))
    a = viterbi_per_group(x, go, I6_PARAMS, group_sds, impl="packed")
    b = viterbi_per_group(x, go, I6_PARAMS, group_sds, impl="perchr")
    assert np.array_equal(a, b)
