"""The run() pipeline driver — the reference's 23-step orchestrator
(R/inferCNV_ops.R:242-1652) rebuilt around functional JAX ops.

Every L1 op is mirrored onto the hspike child object when present (the
reference's load-bearing invariant for HMM emission calibration, e.g.
inferCNV_ops.R:1695-1698, 2427-2430, 2762-2765) — here via `_mirrored`.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from infercnv_tpu.core.object import InferCNV
from infercnv_tpu.models import hmm as hmm_mod
from infercnv_tpu.models.hspike import build_hspike
from infercnv_tpu.ops import transforms as T
from infercnv_tpu.ops.smoothing import (
    smooth_by_chromosome,
    smooth_by_chromosome_coordinates,
)
from infercnv_tpu.report.regions import generate_cnv_region_reports
from infercnv_tpu.runner import checkpoint as ckpt
from infercnv_tpu.runner.config import RunConfig
from infercnv_tpu.parallel.stats import to_host as _to_host
from infercnv_tpu.subcluster.partition import define_tumor_subclusters, split_references
from infercnv_tpu.utils.logging import log_info, log_warn, set_debug
from infercnv_tpu.utils.profiling import StepTimer


class RunResult:
    """Outputs of run(): the final denoised object, plus HMM products.

    ``hmm_states`` / ``hmm_proxy_values`` are materialized LAZILY: subcluster
    -mode runs keep the factorized per-group state rows internally
    (models.hmm.GroupedStates), and the [C, G] matrices are only expanded on
    first attribute access — at 100k cells each expansion is ~1-3.5 GB of
    pure memory writes the pipeline itself never needs."""

    def __init__(self):
        self.infercnv_obj: Optional[InferCNV] = None
        self._hmm_states = None           # ndarray [C, G] or GroupedStates
        self._proxy_num_states: Optional[int] = None
        self._hmm_proxy_values: Optional[np.ndarray] = None
        self.hmm_gene_order = None
        self.subclusters_per_chr = None
        self.bayes_result = None
        self.region_reports = None
        self.timer = None

    @property
    def hmm_states(self) -> Optional[np.ndarray]:
        """[C, G] 1-based state matrix (int8)."""
        if self._hmm_states is not None and hasattr(self._hmm_states, "materialize"):
            self._hmm_states = self._hmm_states.materialize()
        return self._hmm_states

    @hmm_states.setter
    def hmm_states(self, value) -> None:
        self._hmm_states = value

    @property
    def hmm_proxy_values(self) -> Optional[np.ndarray]:
        """[C, G] CNV proxy levels (float32)."""
        if self._hmm_proxy_values is None and self._hmm_states is not None \
                and self._proxy_num_states:
            from infercnv_tpu.models.hmm import assign_states_to_proxy_values

            self._hmm_proxy_values = assign_states_to_proxy_values(
                self.hmm_states, self._proxy_num_states)
        return self._hmm_proxy_values

    @hmm_proxy_values.setter
    def hmm_proxy_values(self, value) -> None:
        self._hmm_proxy_values = value


def _has_multiple_states(states) -> bool:
    """True when more than one distinct state value exists — checked on
    the factorized rows or row-chunks with early exit (np.unique over a
    full [C, G] matrix sorts ~1e9 elements just to answer a yes/no)."""
    src = np.asarray(getattr(states, "rows", states))
    first = src.flat[0]
    for b in range(0, src.shape[0], 1024):
        if (src[b:b + 1024] != first).any():
            return True
    return False


def _states_matrix(states) -> Optional[np.ndarray]:
    """Expand factorized GroupedStates to [C, G] (no-op on a matrix)."""
    if states is not None and hasattr(states, "materialize"):
        return states.materialize()
    return states


def _mirrored(obj: InferCNV, fn, *args, **kwargs) -> None:
    """Apply an expr->expr op to obj and (recursively) its hspike."""
    obj.expr = np.asarray(fn(obj.expr, *args, **kwargs))
    if obj.hspike is not None:
        _mirrored(obj.hspike, fn, *args, **kwargs)


def _subtract_ref(obj: InferCNV, inv_log: bool, use_bounds: bool) -> None:
    """reference subtract_ref_expr_from_obs (inferCNV_ops.R:1678-1702):
    refless fallback uses the mean over all (observation) cells."""
    if obj.has_reference_cells():
        groups = list(obj.ref_groups.values())
    else:
        groups = [obj.all_obs_idx()]
    M = T.group_onehot(groups, obj.num_cells)
    means = T.ref_group_gene_means(obj.expr, M, inv_log=inv_log)
    obj.expr = np.asarray(T.subtract_ref_expr(obj.expr, means, use_bounds=use_bounds))
    if obj.hspike is not None:
        _subtract_ref(obj.hspike, inv_log, use_bounds)


def _smooth(obj: InferCNV, cfg: RunConfig) -> None:
    if cfg.smooth_method == "pyramidinal":
        obj.expr = np.asarray(smooth_by_chromosome(obj.expr, obj.gene_order, cfg.window_length, "pyramidinal"))
    elif cfg.smooth_method == "runmeans":
        obj.expr = np.asarray(smooth_by_chromosome(obj.expr, obj.gene_order, cfg.window_length, "runmeans"))
    elif cfg.smooth_method == "coordinates":
        obj.expr = np.asarray(smooth_by_chromosome_coordinates(obj.expr, obj.gene_order, cfg.window_length))
    if obj.hspike is not None:
        # hspike always uses gene-window smoothing (fake genome positions);
        # coordinates mode mirrors with window 51 (reference :2421-2424)
        h = obj.hspike
        if cfg.smooth_method == "coordinates":
            h.expr = np.asarray(smooth_by_chromosome(h.expr, h.gene_order, 51, "pyramidinal"))
        else:
            method = "runmeans" if cfg.smooth_method == "runmeans" else "pyramidinal"
            h.expr = np.asarray(smooth_by_chromosome(h.expr, h.gene_order, cfg.window_length, method))


def _engine_fast_ok(cfg: RunConfig, skip_past: int) -> bool:
    """True when steps 4-14 can run as ONE fused engine program per cell
    chunk instead of op-by-op host round-trips.  Requires: no optional
    steps that reshape the gene axis or need intermediate matrices
    (scale_data, split refs, random_trees pre-clustering, chr-end trimming,
    outlier pruning), a numeric clamp threshold (not 'auto'), an
    operator-expressible smoother, and no per-step artifacts requested
    (save_rds / plot_steps / early up_to_step)."""
    if cfg.use_engine is False:
        return False
    ok = (not cfg.scale_data
          and cfg.num_ref_groups is None
          and not (cfg.analysis_mode == "subclusters"
                   and cfg.tumor_subcluster_partition_method == "random_trees")
          and not cfg.remove_genes_at_chr_ends
          and not cfg.prune_outliers
          and cfg.smooth_method in ("pyramidinal", "runmeans", "coordinates")
          and isinstance(cfg.max_centered_threshold, (int, float))
          and not isinstance(cfg.max_centered_threshold, bool)
          and not cfg.plot_steps
          and cfg.up_to_step >= 15
          and skip_past == 0)
    if cfg.use_engine is True and not ok:
        raise ValueError(
            "use_engine=True but the configuration requires op-by-op steps "
            "(scale_data / num_ref_groups / random_trees / chr-end trimming / "
            "outlier pruning / auto threshold / plot_steps / up_to_step<15 "
            "are engine-incompatible)")
    return ok


def _hspike_residual_chain(h: InferCNV, cfg: RunConfig, threshold: float) -> None:
    """Apply the step 4-14 transform chain to the hspike child on host (it
    is tiny); mirrors exactly what the step-by-step path does to it."""
    h.expr = np.asarray(T.log2xplus1(h.expr))
    _subtract_ref(h, inv_log=False, use_bounds=cfg.ref_subtract_use_mean_bounds)
    h.expr = np.asarray(T.apply_max_threshold_bounds(h.expr, float(threshold)))
    if cfg.smooth_method == "coordinates":
        h.expr = np.asarray(smooth_by_chromosome(h.expr, h.gene_order, 51, "pyramidinal"))
    else:
        method = "runmeans" if cfg.smooth_method == "runmeans" else "pyramidinal"
        h.expr = np.asarray(smooth_by_chromosome(h.expr, h.gene_order, cfg.window_length, method))
    h.expr = np.asarray(T.center_cells(h.expr, "median"))
    _subtract_ref(h, inv_log=False, use_bounds=cfg.ref_subtract_use_mean_bounds)
    h.expr = np.asarray(T.invert_log2(h.expr))


def _resolve_mesh(cfg: RunConfig):
    """The cell-axis device mesh for the compiled steps (None = one device).
    SURVEY §2.3: cell-sharded data parallelism is the plan of record."""
    if cfg.mesh is not None:
        return cfg.mesh
    if cfg.n_devices:
        from infercnv_tpu.parallel.engine import make_cell_mesh

        return make_cell_mesh(cfg.n_devices)
    return None


def _norm_factor(obj: InferCNV, mesh) -> float:
    """Depth-norm factor = median library size (inferCNV_ops.R:3095).
    Library sizes are host sums (identical in both paths); under a mesh the
    median runs as the sharded radix select (parallel/stats.py) — exact, so
    mesh and single-device runs stay bitwise-equal."""
    libsizes = obj.expr.sum(axis=1)
    if mesh is not None and libsizes.size % mesh.devices.size == 0:
        from infercnv_tpu.parallel.stats import (
            put_cell_sharded,
            sharded_median,
            to_host,
        )

        return float(to_host(sharded_median(
            put_cell_sharded(libsizes.astype(np.float32), mesh), mesh)))
    return float(np.median(libsizes))


def _run_engine_residual(obj: InferCNV, cfg: RunConfig, timer: StepTimer) -> None:
    """STEPS 4-14 as the fused CnvEngine transform (log -> bounds subtract ->
    clamp -> smooth -> median-center -> subtract -> unlog), streamed in cell
    chunks — the same compiled program bench.py measures, proven equivalent
    to the op-by-op path (tests/test_engine_pipeline_unify.py).  obj.expr
    must already be depth-normalized (engine normalization is idempotent on
    normalized input).  With cfg.n_devices/mesh the chunk program runs
    shard_mapped over the cell mesh (per-shard identical math -> bitwise
    equal to the single-device path)."""
    from infercnv_tpu.models.hmm import HMMParams
    from infercnv_tpu.parallel.engine import CnvEngine, EngineConfig

    mesh = _resolve_mesh(cfg)
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    log_info("STEPS 04-14: fused engine transform (use_engine fast path"
             + (f", {n_dev}-device cell mesh)" if mesh is not None else ")"))
    with timer.step("04-14_engine_transform"):
        # decide device-residency BEFORE building the engine: when chunks
        # are kept on device for step 15 they must stay f32, otherwise the
        # engine can store the residual in the download dtype directly
        # (half the HBM write + link bytes; rounding identical to the
        # post-hoc cast — see residual_fused.py out_dtype)
        resid_bytes = 2.2 * obj.num_cells * obj.num_genes * 4
        keep_device = (cfg.analysis_mode == "subclusters"
                       and cfg.tumor_subcluster_partition_method == "leiden"
                       and not cfg.per_chr_hmm_subclusters
                       and mesh is None
                       and resid_bytes < 11e9)
        tdtype = cfg.engine_transfer_dtype
        kernel_out = (tdtype if (tdtype in ("float16", "bfloat16")
                                 and not keep_device) else "float32")
        ecfg = EngineConfig(
            window_length=cfg.window_length,
            smooth_method=cfg.smooth_method,
            max_centered_threshold=float(cfg.max_centered_threshold),
            ref_subtract_use_bounds=cfg.ref_subtract_use_mean_bounds,
            center_method="median",
            denoise=False,
            out_dtype=kernel_out,
        )
        # transform-only use: HMM params are placeholders
        params = HMMParams(means=np.arange(1.0, 7.0), sds=np.ones(6), t=1e-6)
        engine = CnvEngine(obj.gene_order, params, ecfg, mesh=mesh)
        if obj.has_reference_cells():
            groups = [np.asarray(v) for v in obj.ref_groups.values()]
        else:
            groups = [obj.all_obs_idx()]
        ref_idx = np.concatenate(groups)
        onehot = np.zeros((len(groups), ref_idx.size), np.float32)
        pos = {int(c): i for i, c in enumerate(ref_idx)}
        for k, g in enumerate(groups):
            onehot[k, [pos[int(c)] for c in g]] = 1.0
        norm_factor = _norm_factor(obj, mesh)
        ml, mr, _ = engine.ref_stats(obj.expr[ref_idx], norm_factor, onehot)
        C = obj.num_cells
        base_chunk = cfg.engine_chunk_cells or 16384
        chunk = max(base_chunk // n_dev, 1) * n_dev  # divisible by the mesh
        probe_src = obj.expr[:chunk]  # view; device-time probe input below
        # the residual is ALWAYS float32 regardless of the input counts
        # dtype (u16 raw counts ride the fused kernel at half the bytes)
        out_bytes = obj.num_cells * obj.num_genes * 4
        if (cfg.residual_memmap_gb is not None
                and out_bytes > cfg.residual_memmap_gb * 1e9):
            mm_path = os.path.join(cfg.out_dir, "_residual.f32.memmap")
            log_info(f"-residual matrix {out_bytes/1e9:.1f} GB -> disk memmap "
                     f"{mm_path} (bounded host RSS)")
            out = np.memmap(mm_path, dtype=np.float32, mode="w+",
                            shape=(obj.num_cells, obj.num_genes))
        else:
            out = np.empty((obj.num_cells, obj.num_genes), np.float32)
        if tdtype is not None and tdtype != "float32":
            import jax.numpy as _jnp

            log_info(f"-engine chunk downloads as {tdtype}"
                     + (" (kernel-direct)" if kernel_out == tdtype else ""))
            if kernel_out == tdtype:
                _tcast = lambda r: r  # kernel already stored narrow  # noqa: E731
            else:
                _tcast = lambda r: r.astype(getattr(_jnp, tdtype))  # noqa: E731
        else:
            _tcast = lambda r: r  # noqa: E731
        # double-buffered streaming: dispatch chunk i+1 before blocking on
        # chunk i's result, so host<->device transfers overlap device
        # compute (the remote-TPU link is the bottleneck at 100k cells).
        # NOTE copy_to_host_async was measured to DOUBLE-transfer on the
        # axon relay (worse than the cold synchronous fetch) — don't.
        # retaining the residual on device costs ~2x C*G*4 bytes of HBM
        # (chunks + step 15's gene-filtered copy); guard so matrices that
        # only fit BECAUSE of chunked streaming don't OOM the chip
        # (keep_device/resid_bytes computed above, before the engine build)
        device_chunks = [] if keep_device else None
        pending = []
        for b in range(0, C, chunk):
            block = obj.expr[b:b + chunk]
            nb = block.shape[0]
            if mesh is not None:
                from infercnv_tpu.parallel.stats import put_cell_sharded

                if nb % n_dev:  # pad the tail to the mesh (rows are
                    # independent; padding never mixes into real cells)
                    pad = n_dev - nb % n_dev
                    block = np.concatenate(
                        [block, np.ones((pad, block.shape[1]), block.dtype)])
                block = put_cell_sharded(block, mesh)
            r = engine.transform_chunk(block, norm_factor, ml, mr)
            if device_chunks is not None:
                device_chunks.append((b, nb, r))
            pending.append((b, nb, _tcast(r)))
            if len(pending) > 1:
                b0, n0, r0 = pending.pop(0)
                out[b0:b0 + n0] = _to_host(r0)[:n0]
        for b0, n0, r0 in pending:
            out[b0:b0 + n0] = _to_host(r0)[:n0]
        obj.expr = out
        if device_chunks is not None:
            # the residual ALREADY lives on device — keep it for step 15's
            # PCA/kNN so subclustering never re-uploads group rows (freed
            # by the pipeline right after subclustering); a private attr,
            # NOT options (checkpoints JSON-serialize options)
            obj._device_residual = device_chunks
    if C >= 50_000 and mesh is None:
        # DEVICE-compute seconds alongside the step wall (VERDICT r4 item
        # 8): on remote relays the step's wall is link-dominated (421-562 s
        # at 100k for an identical program), which hides compute
        # regressions below ~35%.  Re-time one warm chunk with its input
        # already device-resident, dependence-chained so XLA cannot
        # overlap iterations, and scale by the chunk count.
        try:
            import time as _time

            import jax
            import jax.numpy as jnp
            from jax import lax

            probe = jnp.asarray(probe_src)
            iters = 4

            def _body(i, x):
                fb = jnp.sum(engine.transform_chunk(x, norm_factor, ml, mr))
                return x + (0.0 * fb).astype(x.dtype)

            chained = jax.jit(lambda x0: lax.fori_loop(0, iters, _body, x0))
            jax.block_until_ready(chained(probe))
            t0 = _time.perf_counter()
            jax.block_until_ready(chained(probe))
            per_chunk = (_time.perf_counter() - t0) / iters
            dev_s = per_chunk * (-(-C // chunk))
            timer.records.append({"step": "04-14_engine_transform.device",
                                  "seconds": round(dev_s, 4)})
            log_info(f"[timing] 04-14_engine_transform.device: {dev_s:.3f}s "
                     f"({per_chunk*1e3:.1f} ms/chunk x {-(-C // chunk)}; "
                     "wall - device = link/host time)")
        except Exception as e:  # the probe must never kill a run
            log_warn(f"device-time probe skipped: {e}")
    if obj.hspike is not None:
        with timer.step("04-14_hspike_mirror"):
            _hspike_residual_chain(obj.hspike, cfg, float(cfg.max_centered_threshold))


def _remove_genes_at_chr_ends(obj: InferCNV, window_length: int) -> None:
    drop = T.genes_at_chr_ends(obj.gene_order, window_length)
    if drop.size == 0:
        raise RuntimeError("No genes removed at chr ends ... something wrong here")
    obj.remove_genes(drop)
    if obj.hspike is not None:
        _remove_genes_at_chr_ends(obj.hspike, window_length)


def _clear_noise(obj: InferCNV, cfg: RunConfig) -> None:
    """Step 22 (reference :1559-1615).  Not mirrored onto hspike."""
    if cfg.noise_filter is not None:
        if cfg.noise_filter > 0:
            if obj.has_reference_cells():
                center = float(obj.expr[obj.all_ref_idx()].mean())
            else:
                center = float(obj.expr.mean())
            if cfg.noise_logistic:
                obj.expr = np.asarray(T.depress_log_signal_midpt_val(obj.expr, center, cfg.noise_filter))
            else:
                obj.expr = np.asarray(T.clear_noise(obj.expr, cfg.noise_filter, center))
    else:
        ref_idx = obj.all_ref_idx() if obj.has_reference_cells() else obj.all_obs_idx()
        if cfg.noise_logistic:
            center, spread = T.ref_mean_sd_bounds(obj.expr, ref_idx, cfg.sd_amplifier)
            obj.expr = np.asarray(T.depress_log_signal_midpt_val(obj.expr, float(center), float(spread)))
        else:
            # >8 GB matrices denoise block-wise in place (the buffer is
            # run()-owned: the engine allocated it) — no full-size
            # temporaries, and a memmap-backed residual stays on disk
            obj.expr = np.asarray(T.clear_noise_via_ref_mean_sd(
                obj.expr, ref_idx, cfg.sd_amplifier,
                inplace=(isinstance(obj.expr, np.ndarray)
                         and obj.expr.size > 2_000_000_000)))


def _plot_states(obj: InferCNV, values, cfg: RunConfig,
                 output_filename: str, title: str, x_center: float,
                 x_range, row_order_cache=None, value_lut=None) -> None:
    """Render a state/proxy-value matrix with the standard heatmap layout
    (reference plots at steps 17 and 20, inferCNV_ops.R:1330-1351, 1483-1500).

    values: a [C, G] matrix OR a models.hmm.GroupedStates (factorized) —
    factorized renders in O(K*G) without ever expanding [C, G].  value_lut:
    state value -> display value (proxy levels); integer matrices without a
    lut display the states themselves (identity lut, so the int8 matrix is
    never widened to float)."""
    from infercnv_tpu.viz.heatmap import plot_cnv as _plot_cnv

    kw = {}
    if hasattr(values, "cell_to_row"):  # GroupedStates
        rows = (np.asarray(value_lut, np.float32)[values.rows]
                if value_lut is not None else values.rows.astype(np.float32))
        kw["row_values"] = (rows, values.cell_to_row)
        view_expr = obj.expr  # only consulted on a row-order cache miss
    else:
        view_expr = np.asarray(values)
        if value_lut is not None:
            kw["value_lut"] = value_lut
        elif view_expr.dtype.kind in "iu":
            kw["value_lut"] = np.arange(int(view_expr.max()) + 1,
                                        dtype=np.float32)
        else:
            view_expr = view_expr.astype(np.float32, copy=False)
    view = InferCNV(
        expr=view_expr, counts=obj.counts,
        gene_order=obj.gene_order, cell_names=list(obj.cell_names),
        ref_groups=obj.ref_groups, obs_groups=obj.obs_groups,
        tumor_subclusters=obj.tumor_subclusters,
    )
    try:
        _plot_cnv(view, out_dir=cfg.out_dir, output_filename=output_filename,
                  title=title, k_obs_groups=cfg.k_obs_groups,
                  cluster_by_groups=cfg.cluster_by_groups,
                  cluster_references=cfg.cluster_references,
                  x_center=x_center, x_range=x_range,
                  plot_chr_scale=cfg.plot_chr_scale, chr_lengths=cfg.chr_lengths,
                  row_order_cache=row_order_cache,
                  png_res=cfg.png_res,
                  hclust_method=cfg.plot_hclust_method,
                  max_pane_rows=2000 if cfg.useRaster else 10**9,
                  output_format=cfg.output_format, **kw)
    except Exception as e:  # plotting must never kill an analysis run
        log_warn(f"state plot failed: {e}")


def run(obj: InferCNV, out_dir: Optional[str] = None, **kwargs) -> RunResult:
    """Run the full pipeline.  kwargs mirror the reference run() arguments
    (see RunConfig).  Returns a RunResult."""
    cfg = RunConfig(out_dir=out_dir, **kwargs)
    cfg.validate()
    if cfg.debug:
        set_debug(True)
    if cfg.out_dir is None:
        raise ValueError("Error, out_dir is NULL, please provide a path")
    os.makedirs(cfg.out_dir, exist_ok=True)

    result = RunResult()
    # shallow: every pipeline step REBINDS obj.expr (never writes in place),
    # so sharing the caller's matrix is safe and skips a multi-GB copy
    obj = obj.shallow_copy()
    timer = StepTimer(cfg.out_dir)
    result.timer = timer
    # one pane ordering shared by the preliminary / state / final heatmaps
    # (the reference orders every pane by the same stored dendrograms;
    # recomputing per plot costs minutes at 100k cells)
    row_order_cache: Dict = {}

    resume_token = f".HMM{cfg.HMM_type}" if cfg.HMM else ""
    cum_args = ckpt.relevant_args_by_step(cfg)

    skip_past = 0
    resume_step = 0
    resume_states: Optional[np.ndarray] = None
    if cfg.resume_mode and cfg.save_rds:
        orig_obj = obj
        step, restored, _states = ckpt.scan_resume(
            cfg.out_dir, cfg, resume_token, obj.options.get("counts_md5"))
        if (15 <= step <= 16 and cfg.HMM
                and cfg.per_chr_hmm_subclusters
                and cfg.tumor_subcluster_partition_method == "leiden"):
            # the per-chromosome partitions step 17 needs are not
            # checkpointed; resuming at 15/16 would silently downgrade the
            # HMM to plain subcluster mode — resume from 14 and recompute
            log_warn("resume: per_chr_hmm_subclusters needs step 15 to "
                     "re-run; resuming from step 14 instead")
            step, restored, _states = ckpt.scan_resume(
                cfg.out_dir, cfg, resume_token, obj.options.get("counts_md5"),
                max_step=14)
        if step > 0:
            obj = restored
            resume_step = step
            # Steps 17-20 checkpoint the separate HMM chain (reference
            # inferCNV_ops.R:459-529 special-cases 17->20 and the mcmc_obj).
            # Their expr payload is the post-step-16 matrix, so the expr
            # chain resumes at 16; steps >= 21 carry post-HMM expr edits and
            # resume in place.
            skip_past = 16 if 17 <= step <= 20 else step
            if step >= 17:
                if _states is not None:
                    resume_states = np.asarray(_states)
                else:
                    # landed on a 21/22 checkpoint: the HMM states live in
                    # the separate 19 (post-Bayes) or 17 (raw) files
                    _hstep, hstates = ckpt.scan_hmm_states(
                        cfg.out_dir, cfg, resume_token,
                        obj.options.get("counts_md5"))
                    if hstates is not None:
                        # args matching at step >= 21 implies the Bayes args
                        # matched too, so these states are final
                        resume_states = hstates
            if cfg.HMM and resume_states is None and resume_step >= 21:
                # state files are gone: the 21/22 expr is post-HMM-epilogue
                # but Viterbi needs the post-16 matrix -> resume only up to 16
                log_warn("resume: HMM state checkpoints missing; recomputing HMM chain")
                obj = orig_obj
                resume_step = 0
                skip_past = 0
                step2, restored2, _ = ckpt.scan_resume(
                    cfg.out_dir, cfg, resume_token,
                    obj.options.get("counts_md5"), max_step=16)
                if step2 > 0:
                    obj = restored2
                    skip_past = step2

    def save(step: int, states: Optional[np.ndarray] = None) -> None:
        if cfg.save_rds and skip_past < step:
            path = os.path.join(cfg.out_dir, ckpt.step_filename(step, resume_token))
            ckpt.save_step(obj, path, cum_args[step - 1], states)
        if cfg.plot_steps and not cfg.no_plot and skip_past < step and 2 <= step <= 16:
            # incremental step plots (reference plot_steps at each stage)
            from infercnv_tpu.viz.heatmap import plot_cnv as _plot_cnv

            try:
                _plot_cnv(obj, out_dir=cfg.out_dir,
                          output_filename=f"infercnv.{step:02d}_{ckpt.STEP_TOKENS[step]}",
                          title=f"{step:02d}_{ckpt.STEP_TOKENS[step]}",
                          k_obs_groups=cfg.k_obs_groups,
                          cluster_by_groups=cfg.cluster_by_groups,
                          cluster_references=cfg.cluster_references,
                          output_format=cfg.output_format)
            except Exception as e:
                log_warn(f"step plot failed: {e}")

    def done(step: int) -> bool:
        return cfg.up_to_step == step

    # STEP 1: incoming data
    log_info("STEP 1: incoming data")
    save(1)
    if done(1):
        result.infercnv_obj = obj
        return result

    # STEP 2: gene filters.  Both criteria are per-gene-local (a gene's
    # mean and expressing-cell count never depend on other genes), so the
    # two reference filters (inferCNV_ops.R:2128-2213, applied
    # sequentially) reduce to ONE removal — identical surviving set, half
    # the full-matrix copies (copies dominate this step at 100k cells).
    if skip_past < 2:
        log_info("STEP 02: Removing lowly expressed genes")
        with timer.step("02_gene_filter"):
            drop1 = T.below_min_mean_expr_cutoff(obj.expr, cfg.cutoff)
            if drop1.size:
                log_info(f"Removing {drop1.size} genes below mean expr threshold {cfg.cutoff}")
            drop2 = T.genes_below_min_cells_ref(obj.expr, cfg.min_cells_per_gene)
            drop2 = np.setdiff1d(drop2, drop1)
            if drop1.size + drop2.size == obj.num_genes:
                raise RuntimeError("All genes removed! Must revisit your data, cannot continue")
            if drop2.size:
                log_info(f"Removed {drop2.size} genes with fewer than {cfg.min_cells_per_gene} cells expressing")
            drop = np.union1d(drop1, drop2)
            if drop.size:
                obj.remove_genes(drop)
        save(2)
    if done(2):
        result.infercnv_obj = obj
        return result

    # STEP 3: depth normalization (+ hspike build).  On the engine fast
    # path (no per-step checkpoints, no sim_foreground) the normalized
    # matrix is never materialized on host: counts stay RAW, the hspike
    # statistics pass normalizes on the fly, and the engine normalizes on
    # device (its transform is normalization-idempotent) — one fewer
    # full-matrix host write at 100k cells.
    raw_engine = (_engine_fast_ok(cfg, skip_past) and not cfg.save_rds
                  and not cfg.sim_foreground)
    if skip_past < 3:
        log_info("STEP 03: normalization by sequencing depth")
        with timer.step("03_normalize+hspike"):
            norm_factor = None
            if raw_engine:
                norm_factor = float(np.median(
                    np.asarray(obj.expr).sum(axis=1, dtype=np.float64)))
                log_info("-engine fast path: counts stay raw on host "
                         f"(device normalization, factor {norm_factor:g})")
            else:
                obj.expr = np.asarray(T.normalize_counts_by_seq_depth(obj.expr))
            if cfg.HMM and cfg.HMM_type == "i6":
                obj.hspike = build_hspike(obj, sim_method=cfg.sim_method,
                                          aggregate_normals=cfg.hspike_aggregate_normals,
                                          seed=cfg.seed,
                                          common_dispersion=cfg.hspike_common_dispersion,
                                          normalize_factor=norm_factor)
            if cfg.sim_foreground:
                # developer/debug option (reference inferCNV_ops.R:592-593)
                from infercnv_tpu.models.hspike import sim_foreground

                sim_foreground(obj, sim_method=cfg.sim_method, seed=cfg.seed)
        save(3)
    if done(3):
        result.infercnv_obj = obj
        return result

    # STEPS 4-14 fused fast path: one compiled engine program per cell chunk.
    # With save_rds, only the step-14 checkpoint is written (the 4-13
    # intermediates are never materialized); resume picks it up as usual.
    if _engine_fast_ok(cfg, skip_past) and skip_past < 14:
        _run_engine_residual(obj, cfg, timer)
        if (not cfg.save_rds and not cfg.save_final_rds
                and obj.counts is not None
                and getattr(obj.counts, "nbytes", 0) > 4_000_000_000):
            # no RDS outputs will ever read the raw counts again; at 1M
            # cells the filtered matrix is ~18 GB of host RAM
            log_info("-releasing raw counts matrix "
                     f"({obj.counts.nbytes/1e9:.1f} GB; no RDS outputs "
                     "requested)")
            obj.counts = None
        save(14)  # while skip_past is still < 14
        skip_past = max(skip_past, 14)

    # STEP 4: log transform
    if skip_past < 4:
        log_info("STEP 04: log transformation of data")
        _mirrored(obj, T.log2xplus1)
        save(4)
    if done(4):
        result.infercnv_obj = obj
        return result

    # STEP 5: optional z-scaling
    if cfg.scale_data and skip_past < 5:
        log_info("STEP 05: scaling all expression data")
        _mirrored(obj, T.scale_infercnv_expr)
        save(5)
    if done(5):
        result.infercnv_obj = obj
        return result

    # STEP 6: optional reference splitting
    if cfg.num_ref_groups is not None and skip_past < 6:
        if not obj.has_reference_cells():
            raise ValueError("no reference cells defined; cannot split into groups")
        log_info(f"STEP 06: splitting reference data into {cfg.num_ref_groups} clusters")
        split_references(obj, cfg.num_ref_groups, "complete")
        save(6)
    if done(6):
        result.infercnv_obj = obj
        return result

    # STEP 7: random_trees subclustering happens pre-residual (reference :716-756)
    if (cfg.analysis_mode == "subclusters"
            and cfg.tumor_subcluster_partition_method == "random_trees"
            and skip_past < 7):
        log_info("STEP 07: computing tumor subclusters via random_trees")
        define_tumor_subclusters(
            obj, p_val=cfg.tumor_subcluster_pval, hclust_method=cfg.hclust_method,
            cluster_by_groups=cfg.cluster_by_groups, partition_method="random_trees",
            z_score_filter=cfg.z_score_filter, seed=cfg.seed,
        )
        save(7)
    if done(7):
        result.infercnv_obj = obj
        return result

    # STEP 8: subtract reference profile (log space)
    if skip_past < 8:
        log_info("STEP 08: removing average of reference data (before smoothing)")
        _subtract_ref(obj, inv_log=False, use_bounds=cfg.ref_subtract_use_mean_bounds)
        save(8)
    if done(8):
        result.infercnv_obj = obj
        return result

    # STEP 9: max centered threshold
    if cfg.max_centered_threshold is not None and skip_past < 9:
        threshold = cfg.max_centered_threshold
        if isinstance(threshold, str) and threshold == "auto":
            lo, hi = T.get_average_bounds(obj.expr)
            threshold = float(np.mean(np.abs([float(lo), float(hi)])))
            log_info(f"Setting max centered thresholds via auto to: +- {threshold:g}")
        log_info(f"STEP 09: apply max centered expression threshold: {threshold}")
        _mirrored(obj, T.apply_max_threshold_bounds, float(threshold))
        save(9)
    if done(9):
        result.infercnv_obj = obj
        return result

    # STEP 10: smoothing (hot loop #1)
    if skip_past < 10:
        log_info(f"STEP 10: Smoothing data per cell by chromosome ({cfg.smooth_method})")
        with timer.step("10_smooth"):
            _smooth(obj, cfg)
        save(10)
    if done(10):
        result.infercnv_obj = obj
        return result

    # STEP 11: re-center cells
    if skip_past < 11:
        log_info("STEP 11: re-centering data across chromosome after smoothing")
        _mirrored(obj, T.center_cells, "median")
        save(11)
    if done(11):
        result.infercnv_obj = obj
        return result

    # STEP 12: subtract reference again
    if skip_past < 12:
        log_info("STEP 12: removing average of reference data (after smoothing)")
        _subtract_ref(obj, inv_log=False, use_bounds=cfg.ref_subtract_use_mean_bounds)
        save(12)
    if done(12):
        result.infercnv_obj = obj
        return result

    # STEP 13: optional chromosome-end trimming
    if (cfg.remove_genes_at_chr_ends and cfg.smooth_method != "coordinates"
            and skip_past < 13):
        log_info("STEP 13: removing genes at chr ends")
        _remove_genes_at_chr_ends(obj, cfg.window_length)
        save(13)
    if done(13):
        result.infercnv_obj = obj
        return result

    # STEP 14: invert log2 (log FC -> FC)
    if skip_past < 14:
        log_info("STEP 14: invert log2(FC) to FC")
        _mirrored(obj, T.invert_log2)
        save(14)
    if done(14):
        result.infercnv_obj = obj
        return result

    # STEP 15: subclustering (leiden default) / plain clustering
    subclusters_per_chr = None
    if skip_past < 15:
        if (cfg.analysis_mode == "subclusters"
                and cfg.tumor_subcluster_partition_method != "random_trees"):
            log_info(f"STEP 15: computing tumor subclusters via {cfg.tumor_subcluster_partition_method}")
            timer_ctx = timer.step("15_subclusters")
            timer_ctx.__enter__()
            _dev_chunks = getattr(obj, "_device_residual", None)
            obj._device_residual = None  # freed after this step
            subclusters_per_chr = define_tumor_subclusters(
                obj,
                device_chunks=_dev_chunks,
                p_val=cfg.tumor_subcluster_pval,
                k_nn=cfg.k_nn,
                leiden_method=cfg.leiden_method,
                leiden_function=cfg.leiden_function,
                leiden_resolution=cfg.leiden_resolution,
                leiden_method_per_chr=cfg.leiden_method_per_chr,
                leiden_function_per_chr=cfg.leiden_function_per_chr,
                leiden_resolution_per_chr=cfg.leiden_resolution_per_chr,
                hclust_method=cfg.hclust_method,
                cluster_by_groups=cfg.cluster_by_groups,
                partition_method=cfg.tumor_subcluster_partition_method,
                per_chr_hmm_subclusters=cfg.per_chr_hmm_subclusters,
                per_chr_hmm_subclusters_references=cfg.per_chr_hmm_subclusters_references,
                z_score_filter=cfg.z_score_filter,
                seed=cfg.seed,
                # f16-transferred residuals carry f16-quantized values, so
                # re-uploading PCA rows as f16 is LOSSLESS and halves the
                # dominant subclustering transfer at 1M cells
                pca_upload_dtype=(np.float16
                                  if cfg.engine_transfer_dtype == "float16"
                                  else None),
            )
            del _dev_chunks  # release the device-resident residual copy
            timer_ctx.__exit__(None, None, None)
            from infercnv_tpu.subcluster.partition import PHASE_TIMES

            for ph, sec in sorted(PHASE_TIMES.items(), key=lambda kv: -kv[1]):
                timer.records.append({"step": f"15_subclusters.{ph}",
                                      "seconds": round(sec, 4)})
            if cfg.inspect_subclusters and not cfg.no_plot:
                from infercnv_tpu.viz.subclusters import plot_subclusters

                plot_subclusters(obj, out_dir=cfg.out_dir,
                                 output_filename="infercnv_subclusters",
                                 png_res=cfg.png_res,
                                 output_format=cfg.output_format,
                                 hclust_method=cfg.plot_hclust_method,
                                 max_pane_rows=2000 if cfg.useRaster else 10**9)
        elif cfg.analysis_mode != "subclusters":
            log_info("STEP 15: Clustering samples (not defining tumor subclusters)")
            define_tumor_subclusters(
                obj, p_val=cfg.tumor_subcluster_pval, hclust_method=cfg.hclust_method,
                cluster_by_groups=cfg.cluster_by_groups, partition_method="none",
                z_score_filter=cfg.z_score_filter, seed=cfg.seed,
            )
        save(15)
        result.subclusters_per_chr = subclusters_per_chr
        # milestone: preliminary object
        if cfg.save_rds:
            ckpt.save_step(obj, os.path.join(cfg.out_dir, "preliminary.infercnv_obj.npz"),
                           cum_args[14])
        if not (cfg.no_prelim_plot or cfg.no_plot):
            from infercnv_tpu.viz.heatmap import plot_cnv as _plot_cnv

            timer_plot = timer.step("15_prelim_plot")
            timer_plot.__enter__()
            try:  # plotting must never kill an analysis run
                _plot_cnv(obj, out_dir=cfg.out_dir,
                          output_filename="infercnv.preliminary",
                          title="Preliminary infercnv (pre-noise filtering)",
                          k_obs_groups=cfg.k_obs_groups,
                          cluster_by_groups=cfg.cluster_by_groups,
                          cluster_references=cfg.cluster_references,
                          plot_chr_scale=cfg.plot_chr_scale,
                          chr_lengths=cfg.chr_lengths,
                          write_expr=cfg.write_expr_matrix,
                          write_phylo=cfg.write_phylo,
                          row_order_cache=row_order_cache,
                          png_res=cfg.png_res,
                          hclust_method=cfg.plot_hclust_method,
                          max_pane_rows=2000 if cfg.useRaster else 10**9,
                          output_format=cfg.output_format)
            except Exception as e:
                log_warn(f"preliminary plot failed: {e}")
            timer_plot.__exit__(None, None, None)
    if done(15):
        result.infercnv_obj = obj
        return result

    # STEP 16: optional outlier pruning
    if cfg.prune_outliers and skip_past < 16:
        log_info("STEP 16: Removing outliers")
        obj.expr = np.asarray(T.remove_outliers_norm(
            obj.expr, cfg.outlier_method_bound,
            cfg.outlier_lower_bound, cfg.outlier_upper_bound))
        if obj.hspike is not None:
            obj.hspike.expr = np.asarray(T.remove_outliers_norm(
                obj.hspike.expr, cfg.outlier_method_bound,
                cfg.outlier_lower_bound, cfg.outlier_upper_bound))
        save(16)
    if done(16):
        result.infercnv_obj = obj
        return result

    # STEP 17: HMM CNV prediction (hot loop #2)
    hmm_states = None
    hmm_resume_token = f"{resume_token}.hmm_mode-{cfg.analysis_mode}"
    if cfg.HMM and resume_states is not None and resume_step >= 17:
        # resume the 17->20 chain: step-17 states are raw Viterbi calls,
        # step-19 states are post-Bayes-filter (reference :459-529)
        log_info(f"STEP 17: resuming HMM predictions from step-{resume_step} checkpoint")
        hmm_states = resume_states
        result.hmm_states = hmm_states
        result.hmm_gene_order = obj.gene_order
    elif cfg.HMM:
        log_info("STEP 17: HMM-based CNV prediction")
        mesh17 = _resolve_mesh(cfg)
        timer_hmm = timer.step("17_hmm")
        timer_hmm.__enter__()
        if cfg.HMM_type == "i6":
            cnv_mean_sd = hmm_mod.get_spike_dists(obj.hspike)
            trend_fits = hmm_mod.cnv_mean_sd_trend_fit(obj.hspike, seed=cfg.seed)
            params = hmm_mod.i6_hmm_params(cnv_mean_sd, t=cfg.HMM_transition_prob)
            neutral = hmm_mod.NEUTRAL_STATE_I6
        else:
            params = hmm_mod.i3_hmm_params(
                obj.expr, list(obj.ref_groups.values()), list(obj.obs_groups.values()),
                t=cfg.HMM_transition_prob, i3_p_val=cfg.HMM_i3_pval,
                use_KS=cfg.HMM_i3_use_KS)
            trend_fits = None
            neutral = hmm_mod.NEUTRAL_STATE_I3

        if cfg.analysis_mode == "subclusters":
            if (cfg.per_chr_hmm_subclusters and cfg.HMM_type == "i6"
                    and cfg.tumor_subcluster_partition_method == "leiden"
                    and result.subclusters_per_chr):
                hmm_states = hmm_mod.predict_hmm_on_subclusters_per_chr(
                    obj, params, result.subclusters_per_chr, trend_fits)
            else:
                groups: Dict[str, np.ndarray] = {}
                if obj.tumor_subclusters is not None:
                    for _g, subs in obj.tumor_subclusters["subclusters"].items():
                        groups.update(subs)
                if not groups:
                    log_warn("No subclusters defined, running on whole samples")
                    groups = {**obj.obs_groups, **obj.ref_groups}
                # states stay FACTORIZED (per-group rows + cell->row map):
                # region reports, the state heatmap, and the Bayes region
                # builder all consume that form without the [C, G] expansion
                hmm_states = hmm_mod.predict_hmm_on_groups(
                    obj, params, groups, trend_fits, mesh=mesh17,
                    factorized=True)
        elif cfg.analysis_mode == "cells":
            hmm_states = hmm_mod.predict_hmm_on_cells(obj, params, mesh=mesh17)
        else:  # samples
            if cfg.cluster_by_groups:
                groups = {**obj.obs_groups, **obj.ref_groups}
            else:
                groups = {"all_observations": obj.all_obs_idx(), **obj.ref_groups}
            hmm_states = hmm_mod.predict_hmm_on_groups(
                obj, params, groups, trend_fits, mesh=mesh17, factorized=True)

        result.region_reports = generate_cnv_region_reports(
            obj, hmm_states,
            output_filename_prefix=f"17_HMM_pred{hmm_resume_token}",
            out_dir=cfg.out_dir,
            ignore_neutral_state=neutral,
            by=cfg.HMM_report_by,
        )
        timer_hmm.__exit__(None, None, None)
        if cfg.save_rds and skip_past < 17:
            save(17, states=_states_matrix(hmm_states))
        result.hmm_states = hmm_states
        result.hmm_gene_order = obj.gene_order
        if not cfg.no_plot:
            timer_p17 = timer.step("17_state_plot")
            timer_p17.__enter__()
            _plot_states(obj, hmm_states, cfg,
                         output_filename=f"infercnv.17_HMM_pred{hmm_resume_token}",
                         title="17_HMM_preds",
                         x_center=float(neutral),
                         x_range=(0.0, 6.0) if cfg.HMM_type == "i6" else (1.0, 3.0),
                         row_order_cache=row_order_cache)
            timer_p17.__exit__(None, None, None)
    if done(17):
        result.infercnv_obj = obj
        return result

    # STEPS 18-19: Bayesian mixture model filtering
    if cfg.HMM and resume_step >= 19 and hmm_states is not None:
        log_info("STEPS 18-19: resuming post-Bayes filtered states from checkpoint")
    elif (cfg.HMM and cfg.BayesMaxPNormal > 0 and hmm_states is not None
            and _has_multiple_states(hmm_states)):
        log_info("STEP 18: Run Bayesian Network Model on HMM predicted CNVs")
        from infercnv_tpu.models.bayes import bayesian_filter_states

        timer_bayes = timer.step("18_bayes")
        timer_bayes.__enter__()
        hmm_states, bayes_out = bayesian_filter_states(
            obj, hmm_states,
            hmm_type=cfg.HMM_type,
            BayesMaxPNormal=cfg.BayesMaxPNormal,
            hspike=obj.hspike,
            reassign=cfg.reassignCNVs,
            out_dir=os.path.join(cfg.out_dir, f"BayesNetOutput{hmm_resume_token}"),
            report_by=cfg.HMM_report_by,
            seed=cfg.seed,
        )
        timer_bayes.__exit__(None, None, None)
        result.bayes_result = bayes_out
        result.hmm_states = hmm_states
        bayes_dir = os.path.join(cfg.out_dir, f"BayesNetOutput{hmm_resume_token}")
        if cfg.plot_probabilities and not cfg.no_plot:
            from infercnv_tpu.viz.bayes_plots import (
                plot_cell_probabilities,
                plot_cnv_probabilities,
                post_prob_normal_heatmap,
            )

            with timer.step("18_bayes_plots"):
                try:  # plotting must never kill an analysis run
                    plot_cnv_probabilities(bayes_out, bayes_dir)
                    plot_cell_probabilities(bayes_out, bayes_dir)
                    post_prob_normal_heatmap(obj, bayes_out, bayes_out.regions,
                                             cfg.out_dir)
                except Exception as e:
                    log_warn(f"Bayes probability plots failed: {e}")
        if cfg.diagnostics:
            from infercnv_tpu.viz.bayes_plots import mcmc_diagnostic_plots

            try:
                mcmc_diagnostic_plots(bayes_out, bayes_dir)
            except Exception as e:
                log_warn(f"MCMC diagnostic plots failed: {e}")
        save(19, states=hmm_states)
        # adjusted report files — these FILTERED reports also replace the
        # in-memory step-17 reports (the CLI's add_to_metadata export must
        # see the same regions the written Pnorm_* files carry)
        with timer.step("19_region_reports"):
            result.region_reports = generate_cnv_region_reports(
                obj, hmm_states,
                output_filename_prefix=(
                    f"HMM_CNV_predictions{hmm_resume_token}.Pnorm_{cfg.BayesMaxPNormal:g}"),
                out_dir=cfg.out_dir,
                ignore_neutral_state=hmm_mod.NEUTRAL_STATE_I6 if cfg.HMM_type == "i6" else hmm_mod.NEUTRAL_STATE_I3,
                by=cfg.HMM_report_by,
            )
    if done(18) or done(19):
        result.infercnv_obj = obj
        return result

    # STEP 20: states -> proxy expression values (lazy: RunResult expands
    # the [C, G] float matrix only if the caller reads hmm_proxy_values)
    if cfg.HMM and hmm_states is not None:
        log_info("STEP 20: Converting HMM-based CNV states to repr expr vals")
        num_states = 6 if cfg.HMM_type == "i6" else 3
        result._proxy_num_states = num_states
        if not cfg.no_plot:
            timer_p20 = timer.step("20_proxy_plot")
            timer_p20.__enter__()
            _plot_states(obj, hmm_states, cfg,
                         output_filename=(
                             f"infercnv.20_HMM_pred{hmm_resume_token}"
                             f".Pnorm_{cfg.BayesMaxPNormal:g}.repr_intensities"),
                         title="20_HMM_preds.repr_intensities",
                         x_center=1.0, x_range=(-1.0, 3.0),
                         row_order_cache=row_order_cache,
                         value_lut=hmm_mod.proxy_value_lut(num_states))
            timer_p20.__exit__(None, None, None)
    if done(20):
        result.infercnv_obj = obj
        return result

    # STEP 21: optional DE-gene masking
    if cfg.mask_nonDE_genes and skip_past < 21:
        if not obj.has_reference_cells():
            raise ValueError("cannot mask non-DE genes without reference cells")
        log_info("STEP 21: Identify and mask non-DE genes")
        from infercnv_tpu.ops.de_mask import mask_non_DE_genes_basic

        mask_non_DE_genes_basic(
            obj, p_val_thresh=cfg.mask_nonDE_pval, test_use=cfg.test_use,
            center_val=float(obj.expr.mean()),
            require_DE_all_normals=cfg.require_DE_all_normals)
        save(21)
    if done(21):
        result.infercnv_obj = obj
        return result

    # STEP 22: denoising
    if cfg.denoise and skip_past < 22:
        log_info("STEP 22: Denoising")
        with timer.step("22_denoise"):
            _clear_noise(obj, cfg)
        save(22)
    if done(22):
        result.infercnv_obj = obj
        return result

    # STEP 23: final object + plot
    if cfg.save_final_rds and cfg.save_rds:
        ckpt.save_step(obj, os.path.join(cfg.out_dir, "run.final.infercnv_obj.npz"),
                       cum_args[22])
        # also write the ACTUAL RDS the reference ecosystem consumes
        # (add_to_seurat reads run.final.infercnv_obj from out_dir,
        # seurat_interaction.R:23-50)
        if obj.num_cells * obj.num_genes <= 500_000_000:
            from infercnv_tpu.io.rds import save_rds_infercnv

            try:
                save_rds_infercnv(
                    obj, os.path.join(cfg.out_dir, "run.final.infercnv_obj"),
                    options={"analysis_mode": cfg.analysis_mode,
                             "HMM_report_by": cfg.HMM_report_by,
                             "HMM_type": cfg.HMM_type if cfg.HMM else "",
                             "BayesMaxPNormal": cfg.BayesMaxPNormal})
            except Exception as e:  # interop write must never kill a run
                log_warn(f"run.final.infercnv_obj RDS write failed: {e}")
        else:
            log_warn("skipping run.final.infercnv_obj RDS (matrix > 5e8 "
                     "elements; the gzipped float64 R image would be tens "
                     "of GB — use the .npz checkpoint instead)")
    if not cfg.no_plot:
        try:
            from infercnv_tpu.viz.heatmap import plot_cnv

            timer_final = timer.step("23_final_plot")
            timer_final.__enter__()
            plot_cnv(obj, out_dir=cfg.out_dir, output_filename="infercnv",
                     title=cfg.title,
                     obs_title=cfg.title_obs,
                     ref_title=cfg.title_ref,
                     contig_lab_size=cfg.contig_lab_size,
                     color_safe_pal=cfg.color_safe,
                     custom_color_pal=cfg.custom_color_pal,
                     ref_contig=cfg.ref_contig,
                     hclust_method=cfg.plot_hclust_method,
                     dynamic_resize=cfg.dynamic_resize,
                     k_obs_groups=cfg.k_obs_groups,
                     cluster_by_groups=cfg.cluster_by_groups,
                     cluster_references=cfg.cluster_references,
                     x_center=cfg.final_center_val if cfg.final_center_val is not None else 1.0,
                     x_range=cfg.final_scale_limits if cfg.final_scale_limits is not None else "auto",
                     plot_chr_scale=cfg.plot_chr_scale,
                     chr_lengths=cfg.chr_lengths,
                     write_expr=cfg.write_expr_matrix,
                     write_phylo=cfg.write_phylo,
                     png_res=cfg.png_res,
                     max_pane_rows=2000 if cfg.useRaster else 10**9,
                     row_order_cache=row_order_cache,
                     output_format=cfg.output_format)
            timer_final.__exit__(None, None, None)
        except Exception as e:
            # plotting must never kill an analysis run: the in-memory
            # RunResult and the final object still return to the caller
            log_warn(f"final heatmap failed: {e}")

    timer.finish()
    result.infercnv_obj = obj
    return result
