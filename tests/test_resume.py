"""Checkpoint/resume correctness (reference resume scan inferCNV_ops.R:449-529,
.compare_args :3270-3282, counts md5 from creation inferCNV.R:331)."""

import numpy as np
import pytest

from infercnv_tpu.models import hmm as hmm_mod
from infercnv_tpu.runner import checkpoint as ckpt
from infercnv_tpu.runner.pipeline import run
from tests.test_pipeline import make_synthetic

RUN_ARGS = dict(HMM=True, HMM_type="i6", analysis_mode="samples", denoise=True,
                HMM_report_by="consensus", window_length=21, no_plot=True,
                BayesMaxPNormal=0.5)


@pytest.fixture(scope="module")
def first_run(tmp_path_factory):
    obj = make_synthetic()
    out = str(tmp_path_factory.mktemp("resume"))
    res = run(obj, out_dir=out, save_rds=True, **RUN_ARGS)
    return obj, res, out


def test_load_step_restores_counts_hc_options(first_run, tmp_path):
    """load_step must restore raw counts (not expr), plot dendrograms (hc),
    and the full options dict."""
    obj, res, out = first_run
    final = res.infercnv_obj
    path = str(tmp_path / "step.npz")
    args = {"s1.x": 1}
    ckpt.save_step(final, path, args)
    restored, saved_args, _ = ckpt.load_step(path)
    assert saved_args == args
    np.testing.assert_array_equal(restored.counts, final.counts)
    assert not np.array_equal(restored.counts, restored.expr)
    assert restored.options.get("counts_md5") == final.options.get("counts_md5")
    if final.tumor_subclusters and final.tumor_subclusters.get("hc"):
        for g, link in final.tumor_subclusters["hc"].items():
            if link is None:
                continue
            np.testing.assert_array_equal(
                np.asarray(restored.tumor_subclusters["hc"][g]), np.asarray(link))


def test_resume_skips_hmm_recompute(first_run, monkeypatch):
    """A re-run over a completed out_dir must reuse the 17->19 chain without
    re-running Viterbi or the Gibbs sampler (reference :459-529)."""
    obj, res, out = first_run

    def _boom(*a, **k):
        raise AssertionError("HMM prediction re-ran despite valid checkpoint")

    monkeypatch.setattr(hmm_mod, "predict_hmm_on_groups", _boom)
    monkeypatch.setattr(hmm_mod, "predict_hmm_on_cells", _boom)
    import infercnv_tpu.models.bayes as bayes_mod

    monkeypatch.setattr(bayes_mod, "bayesian_filter_states", _boom)

    obj2 = make_synthetic()
    res2 = run(obj2, out_dir=out, save_rds=True, **RUN_ARGS)
    np.testing.assert_array_equal(res2.hmm_states, res.hmm_states)
    np.testing.assert_allclose(res2.infercnv_obj.expr, res.infercnv_obj.expr,
                               atol=1e-6)


def test_resume_reruns_bayes_when_threshold_changes(first_run, monkeypatch):
    """Changing BayesMaxPNormal invalidates step 19 but not step 17: the raw
    Viterbi states are reused, the Bayes filter re-runs."""
    obj, res, out = first_run

    def _boom(*a, **k):
        raise AssertionError("HMM prediction re-ran despite valid step-17 checkpoint")

    monkeypatch.setattr(hmm_mod, "predict_hmm_on_groups", _boom)
    args = dict(RUN_ARGS)
    args["BayesMaxPNormal"] = 0.3
    obj2 = make_synthetic()
    res2 = run(obj2, out_dir=out, save_rds=True, **args)
    assert res2.hmm_states is not None
    assert res2.bayes_result is not None  # Bayes actually re-ran


def test_changed_counts_forces_recompute(first_run):
    """Same args + different input matrix must NOT reuse checkpoints
    (the counts md5 guard; reference stores md5 at creation inferCNV.R:331)."""
    obj, res, out = first_run
    obj2 = make_synthetic(seed=99)  # different data -> different md5
    assert obj2.options["counts_md5"] != obj.options["counts_md5"]
    step, restored, states = ckpt.scan_resume(
        out, _cfg_of(**RUN_ARGS), ".HMMi6", obj2.options["counts_md5"])
    assert step == 0 and restored is None

    # while the original md5 still resumes
    step, restored, states = ckpt.scan_resume(
        out, _cfg_of(**RUN_ARGS), ".HMMi6", obj.options["counts_md5"])
    assert step >= 17 and states is not None


def _cfg_of(**kwargs):
    from infercnv_tpu.runner.config import RunConfig

    return RunConfig(out_dir="unused", **kwargs)
