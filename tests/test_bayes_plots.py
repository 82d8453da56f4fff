"""Bayes probability / MCMC-diagnostic plot outputs (reference
plotProbabilities :808-844, mcmcDiagnosticPlots :866-990) — smoke coverage
plus numeric checks of the Gelman-Rubin and Geweke statistics."""

import os

import numpy as np
import pytest

from infercnv_tpu.viz.bayes_plots import gelman_rubin, geweke_z


def test_gelman_rubin_converged_vs_diverged():
    rng = np.random.default_rng(0)
    # traces: [chains, T, R, S]
    conv = rng.normal(0.5, 0.01, (4, 200, 1, 3))
    div = conv.copy()
    div[0] += 0.5  # one chain in a different mode
    r_conv = gelman_rubin(conv)
    r_div = gelman_rubin(div)
    assert np.all(r_conv < 1.1)
    assert np.all(r_div > 1.5)


def test_geweke_z_stationary_vs_drifting():
    rng = np.random.default_rng(1)
    stat = rng.normal(0, 1, (2, 400, 1, 2))
    drift = stat + np.linspace(0, 3, 400)[None, :, None, None]
    assert np.abs(geweke_z(stat)).max() < 3.0
    assert np.abs(geweke_z(drift)).max() > 5.0


def test_bayes_plot_files_written(tmp_path):
    from infercnv_tpu.models.bayes import BayesResult
    from infercnv_tpu.viz.bayes_plots import (
        mcmc_diagnostic_plots,
        plot_cell_probabilities,
        plot_cnv_probabilities,
    )

    rng = np.random.default_rng(2)
    res = BayesResult()
    res.cnv_region_names = ["chr1-region_1", "chr2-region_2"]
    theta = rng.dirichlet(np.ones(6), size=2).T  # [S, R]
    res.cnv_state_probabilities = theta
    res.cell_probabilities = [rng.dirichlet(np.ones(6), size=5).T for _ in range(2)]
    res.theta_traces = rng.dirichlet(np.ones(6), size=(6, 100, 2))  # [chains, T, R, S]
    res.regions = [{"name": n} for n in res.cnv_region_names]

    out = str(tmp_path)
    plot_cnv_probabilities(res, out)
    plot_cell_probabilities(res, out)
    mcmc_diagnostic_plots(res, out)
    written = os.listdir(out)
    assert any("cnvProb" in f or "cnv" in f.lower() for f in written), written
    assert len(written) >= 3, written


def test_bayes_plot_paging_covers_all_regions(tmp_path):
    """No truncation: >200 regions page into multiple cnvProbs files and
    >64 regions into multiple cellProbs files (reference plots every
    region, R/inferCNV_BayesNet.R:808-844)."""
    from infercnv_tpu.models.bayes import BayesResult
    from infercnv_tpu.viz.bayes_plots import (
        plot_cell_probabilities,
        plot_cnv_probabilities,
    )

    rng = np.random.default_rng(3)
    R = 210
    res = BayesResult()
    res.cnv_region_names = [f"chr1-region_{i}" for i in range(R)]
    res.cnv_state_probabilities = rng.dirichlet(np.ones(6), size=R).T
    res.cell_probabilities = [rng.dirichlet(np.ones(6), size=3).T
                              for _ in range(70)]
    out = str(tmp_path)
    plot_cnv_probabilities(res, out)
    plot_cell_probabilities(res, out)
    files = os.listdir(out)
    assert "cnvProbs.png" in files and "cnvProbs.page2.png" in files, files
    assert "cellProbs.png" in files and "cellProbs.page2.png" in files, files
