"""Simulation-layer tests: meanvar / simple / splatter count simulators."""

import jax
import numpy as np
import pytest

from infercnv_tpu.sim.meanvar import (
    fit_dropout_spline,
    fit_mean_var_spline,
    get_mean_var_table,
    get_mean_vs_p0_table,
    simulate_meanvar_counts,
    simulate_simple_counts,
)
from infercnv_tpu.sim.splatter import estimate_splatter_params, simulate_splatter_counts


@pytest.fixture(scope="module")
def ref_matrix():
    rng = np.random.default_rng(5)
    G, C = 400, 80
    means = rng.gamma(2.0, 40.0, G)
    counts = rng.poisson(means[None, :] * rng.lognormal(0, 0.2, (C, 1)))
    return counts.astype(np.float32), means


def test_meanvar_sim_preserves_means(ref_matrix):
    counts, means = ref_matrix
    m, v = get_mean_var_table(counts, [np.arange(counts.shape[0])])
    spline = fit_mean_var_spline(m, v)
    gene_means = counts.mean(axis=0)
    sim = np.asarray(simulate_meanvar_counts(jax.random.PRNGKey(0), gene_means,
                                             spline, 200))
    assert sim.shape == (200, counts.shape[1])
    assert (sim >= 0).all()
    # simulated means track requested means
    corr = np.corrcoef(sim.mean(axis=0), gene_means)[0, 1]
    assert corr > 0.98


def test_meanvar_sim_dropout_increases_zeros(ref_matrix):
    counts, _ = ref_matrix
    m, v = get_mean_var_table(counts, [np.arange(counts.shape[0])])
    spline = fit_mean_var_spline(m, v)
    m0, p0 = get_mean_vs_p0_table(counts, [np.arange(counts.shape[0])])
    dropout = fit_dropout_spline(m0, p0)
    gene_means = counts.mean(axis=0)
    sim_no = np.asarray(simulate_meanvar_counts(jax.random.PRNGKey(1), gene_means, spline, 100))
    sim_do = np.asarray(simulate_meanvar_counts(jax.random.PRNGKey(1), gene_means, spline, 100, dropout))
    assert (sim_do == 0).mean() >= (sim_no == 0).mean()


def test_simple_sim_nb_variance():
    gene_means = np.full(256, 50.0)
    sim = np.asarray(simulate_simple_counts(jax.random.PRNGKey(2), gene_means, 400,
                                            common_dispersion=0.1))
    # NB variance = mu + mu^2 * disp = 50 + 250 = 300
    v = sim.var(axis=0).mean()
    assert 200 < v < 420
    assert abs(sim.mean() - 50) < 3


def test_splatter_estimate_and_simulate(ref_matrix):
    counts, _ = ref_matrix
    params = estimate_splatter_params(counts.T, include_dropout=True)
    assert params.mean_shape > 0 and params.mean_rate > 0
    assert params.nGenes == counts.shape[1]
    sim = np.asarray(simulate_splatter_counts(jax.random.PRNGKey(3), params,
                                              num_cells=120))
    assert sim.shape == (120, counts.shape[1])
    assert (sim >= 0).all()
    # library sizes should be in a plausible range of the estimated scale
    libs = sim.sum(axis=1)
    assert libs.min() > 0


def test_estimate_common_dispersion_recovers_truth():
    """The NB common-dispersion estimator (reference
    .estimate_common_dispersion, inferCNV_simple_sim.R:227 — dead code there,
    every call site hardcodes 0.1) recovers a planted dispersion."""
    from infercnv_tpu.sim.meanvar import estimate_common_dispersion

    rng = np.random.default_rng(0)
    G, C, phi = 400, 120, 0.1
    mu = rng.gamma(2.0, 30.0, G)
    r = 1.0 / phi
    lam = rng.gamma(r, 1.0 / r, (G, C)) * mu[:, None]
    y = rng.poisson(lam).astype(np.float64)
    est = estimate_common_dispersion(y)
    assert 0.07 < est < 0.14, est

    # near-Poisson data -> small dispersion
    y2 = rng.poisson(np.tile(mu[:, None], (1, C))).astype(np.float64)
    est2 = estimate_common_dispersion(y2)
    assert est2 < 0.02, est2


def test_build_hspike_auto_dispersion():
    """sim_method='simple' with common_dispersion='auto' estimates the NB
    dispersion from the normal cells instead of the reference's hardcoded
    0.1 (inferCNV_hidden_spike.R:86,123)."""
    import numpy as np

    from infercnv_tpu.core.genome import GeneOrder
    from infercnv_tpu.core.object import InferCNV
    from infercnv_tpu.models.hspike import build_hspike
    from infercnv_tpu.ops import transforms as T

    rng = np.random.default_rng(3)
    G, C = 120, 60
    go = GeneOrder(names=tuple(f"g{i}" for i in range(G)),
                   chr_names=("chr1",), chr_ids=np.zeros(G, np.int32),
                   start=np.arange(G), stop=np.arange(G) + 1)
    mu = rng.gamma(2.0, 20.0, G)
    phi = 0.3
    counts = rng.negative_binomial(1 / phi, 1 / (1 + phi * mu[None, :]),
                                   (C, G)).astype(np.float32)
    obj = InferCNV(expr=counts.copy(), counts=counts, gene_order=go,
                   cell_names=[f"c{i}" for i in range(C)],
                   ref_groups={"n": np.arange(C // 2)},
                   obs_groups={"t": np.arange(C // 2, C)})
    obj.expr = np.asarray(T.normalize_counts_by_seq_depth(obj.expr))
    h = build_hspike(obj, sim_method="simple", common_dispersion="auto")
    # one normal group -> 100 simnorm + 100 spike_tumor cells
    assert h is not None and h.expr.shape[0] == 200
    assert (h.expr >= 0).all()


def test_sim_foreground_replaces_expression():
    """run(sim_foreground=True) debug option: every group's expression is
    re-simulated from its own gene means and re-normalized to the median
    normal library size (reference .sim_foreground,
    inferCNV_hidden_spike.R:219-281)."""
    import numpy as np

    from infercnv_tpu.core.genome import GeneOrder
    from infercnv_tpu.core.object import InferCNV
    from infercnv_tpu.models.hspike import sim_foreground
    from infercnv_tpu.ops import transforms as T

    rng = np.random.default_rng(8)
    G, C = 150, 50
    go = GeneOrder(names=tuple(f"g{i}" for i in range(G)),
                   chr_names=("chr1",), chr_ids=np.zeros(G, np.int32),
                   start=np.arange(G), stop=np.arange(G) + 1)
    counts = rng.poisson(rng.gamma(2.0, 20.0, G)[None, :] *
                         np.ones((C, 1))).astype(np.float32)
    obj = InferCNV(expr=counts.copy(), counts=counts, gene_order=go,
                   cell_names=[f"c{i}" for i in range(C)],
                   ref_groups={"n": np.arange(20)},
                   obs_groups={"t": np.arange(20, C)})
    obj.expr = np.asarray(T.normalize_counts_by_seq_depth(obj.expr))
    before = obj.expr.copy()
    gm_before = before[20:].mean(axis=0)
    sim_foreground(obj, sim_method="meanvar", seed=1)
    after = obj.expr
    assert after.shape == before.shape
    assert not np.allclose(after, before)  # actually re-simulated
    # per-gene group means are preserved in distribution (same trend)
    gm_after = after[20:].mean(axis=0)
    r = np.corrcoef(gm_before, gm_after)[0, 1]
    assert r > 0.95
    # re-normalized: every library size equals the target median
    libs = after.sum(axis=1)
    np.testing.assert_allclose(libs, libs[0], rtol=1e-4)
