"""run() <-> engine unification: with engine-compatible configs, steps 4-14
execute as the fused CnvEngine program; results must match the op-by-op path
exactly enough to preserve all downstream products."""

import numpy as np
import pytest

from infercnv_tpu.runner.pipeline import run
from tests.test_pipeline import make_synthetic

ARGS = dict(HMM=True, HMM_type="i6", analysis_mode="samples", denoise=True,
            HMM_report_by="consensus", window_length=21, no_plot=True,
            BayesMaxPNormal=0.5, save_rds=False)


def test_engine_path_matches_op_by_op(tmp_path):
    res_fast = run(make_synthetic(), out_dir=str(tmp_path / "fast"),
                   use_engine=True, **ARGS)
    res_slow = run(make_synthetic(), out_dir=str(tmp_path / "slow"),
                   use_engine=False, **ARGS)
    np.testing.assert_allclose(res_fast.infercnv_obj.expr,
                               res_slow.infercnv_obj.expr,
                               rtol=2e-4, atol=2e-4)
    same = (res_fast.hmm_states == res_slow.hmm_states).mean()
    assert same > 0.999, f"state agreement {same:.5f}"


def test_auto_selects_engine_only_when_compatible(tmp_path):
    from infercnv_tpu.runner.config import RunConfig
    from infercnv_tpu.runner.pipeline import _engine_fast_ok

    ok = RunConfig(out_dir="x", **ARGS)
    assert _engine_fast_ok(ok, 0)
    # save_rds is engine-compatible (only the step-14 checkpoint is written)
    cfg_rds = RunConfig(out_dir="x", **{**ARGS, "save_rds": True})
    assert _engine_fast_ok(cfg_rds, 0)
    for bad in (dict(scale_data=True), dict(prune_outliers=True),
                dict(remove_genes_at_chr_ends=True),
                dict(max_centered_threshold="auto"),
                dict(plot_steps=True), dict(up_to_step=10)):
        cfg = RunConfig(out_dir="x", **{**ARGS, "save_rds": False, **bad})
        assert not _engine_fast_ok(cfg, 0), bad
    # forcing the engine on an incompatible config is a loud error
    with pytest.raises(ValueError):
        _engine_fast_ok(RunConfig(out_dir="x", use_engine=True,
                                  **{**ARGS, "scale_data": True}), 0)


def test_engine_coordinates_smoothing_matches(tmp_path):
    """coordinates smoothing (bp windows) also runs through the engine and
    matches the op-by-op path (i3 HMM: i6+coordinates is forbidden)."""
    args = dict(ARGS, HMM_type="i3", smooth_method="coordinates",
                window_length=10_000)
    res_fast = run(make_synthetic(), out_dir=str(tmp_path / "fast"),
                   use_engine=True, **args)
    res_slow = run(make_synthetic(), out_dir=str(tmp_path / "slow"),
                   use_engine=False, **args)
    np.testing.assert_allclose(res_fast.infercnv_obj.expr,
                               res_slow.infercnv_obj.expr,
                               rtol=2e-4, atol=2e-4)


def test_incompatible_config_still_runs_op_by_op(tmp_path):
    """auto mode falls back silently and produces the same products."""
    res = run(make_synthetic(), out_dir=str(tmp_path), prune_outliers=True,
              **ARGS)
    assert res.hmm_states is not None


def test_engine_path_with_save_rds_resumes_from_step14(tmp_path, monkeypatch):
    """With save_rds, the engine path writes the step-14 checkpoint and a
    re-run resumes from it (steps 4-14 skipped entirely)."""
    from infercnv_tpu.runner import pipeline as pl

    args = dict(ARGS, save_rds=True)
    out = str(tmp_path)
    res1 = run(make_synthetic(), out_dir=out, **args)
    assert (tmp_path / "14_invert_log_transform.HMMi6.infercnv_obj.npz").exists()

    def _boom(*a, **k):
        raise AssertionError("engine transform re-ran despite step-14 checkpoint")

    monkeypatch.setattr(pl, "_run_engine_residual", _boom)
    res2 = run(make_synthetic(), out_dir=out, **args)
    np.testing.assert_allclose(res1.infercnv_obj.expr, res2.infercnv_obj.expr,
                               atol=1e-6)
