"""Sharded CNV engine — the production compute path.

The reference is single-process R (SURVEY §2.3); this module is the
TPU-native scale-out design: the [cells, genes] matrix is sharded on the
cell axis over a ``jax.sharding.Mesh``, reference-group statistics are
computed once (they only involve the reference cells plus one global
median) and broadcast, and the per-cell transform + Viterbi runs as a
single fused jit program per cell chunk — embarrassingly cell-parallel, so
the only collectives XLA inserts are the psums behind the global medians
and reference means.

Streaming design: a 1M-cell x 10k-gene matrix (40 GB) does not fit in one
chip's HBM, so cells flow through in fixed-size chunks; Viterbi backtrace
memory (chunk x chrs x genes) stays bounded.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from infercnv_tpu.core.genome import GeneOrder
from infercnv_tpu.models.hmm import HMMParams
from infercnv_tpu.ops.layout import smoothing_operator
from infercnv_tpu.ops.viterbi_pack import (
    PackedLayout,
    pack_indices as _pack_indices,  # re-export (tests/test_parallel.py)
    viterbi_packed,
)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    window_length: int = 101
    smooth_method: str = "pyramidinal"
    max_centered_threshold: float = 3.0
    ref_subtract_use_bounds: bool = True
    center_method: str = "median"
    denoise: bool = True
    sd_amplifier: float = 1.5
    hmm_t: float = 1e-6
    #: "bfloat16" runs the banded smooth as ONE native MXU pass (bf16
    #: multiply, f32 accumulate) instead of the 6-pass f32 emulation —
    #: ~0.1% relative error, so the f32 default stays the parity path
    matmul_dtype: str = "float32"
    #: radix digits per pass of the exact median select inside the fused
    #: residual kernel (result is exact for any value; 1 measured fastest
    #: on v5e — fewer VPU compare+reduce sweeps than 2)
    median_radix_bits: int = 1
    #: dtype the TRANSFORM path's residual is stored/returned in
    #: ("float32" | "float16" | "bfloat16").  Narrow dtypes halve the HBM
    #: write and download bytes; rounding happens only at the final store,
    #: bit-identical to casting the f32 result.  Internal consumers
    #: (Viterbi, denoise, group sums in full/subcluster chunks) always see
    #: the f32 residual regardless.
    out_dtype: str = "float32"


class CnvEngine:
    """Compiled, shardable smoothing+HMM pass for fixed genome/HMM params."""

    def __init__(self, gene_order: GeneOrder, hmm: HMMParams,
                 config: EngineConfig = EngineConfig(),
                 mesh: Optional[Mesh] = None,
                 use_pallas: Optional[bool] = None):
        self.gene_order = gene_order
        self.config = config
        self.hmm = hmm
        self.mesh = mesh
        if use_pallas is None:
            # the fused Pallas Viterbi (2.8x the XLA scan) runs on real TPU;
            # under a mesh the step runs per-shard via shard_map, so the
            # kernel applies there too.  Decide by the platform the program
            # will actually execute on: the mesh's devices if sharded (a CPU
            # dryrun mesh can coexist with a registered TPU plugin).
            if mesh is not None:
                platform = mesh.devices.flat[0].platform
            else:
                platform = jax.default_backend()
            from infercnv_tpu.ops.viterbi_pack import _is_tpu_platform

            # Mosaic TPU kernels only — GPU/other backends take the XLA path
            use_pallas = _is_tpu_platform(platform)
        self.use_pallas = use_pallas
        # forcing the Pallas path off-TPU (tests) runs the kernel interpreted
        _platform = (mesh.devices.flat[0].platform if mesh is not None
                     else jax.default_backend())
        self._pallas_interpret = bool(use_pallas) and _platform == "cpu"
        # scan unrolling speeds the TPU XLA Viterbi ~1.3x but inflates CPU
        # compile time ~4x (the 8-virtual-device dryrun runs on few cores)
        self._scan_unroll = 1 if _platform == "cpu" else 4
        if config.smooth_method == "coordinates":
            from infercnv_tpu.ops.layout import coordinate_smoothing_operator

            # bp-window (run() remaps gene-unit windows to 10 Mbp;
            # reference R/inferCNV_ops.R:357-361)
            op = coordinate_smoothing_operator(gene_order, config.window_length)
        else:
            op = smoothing_operator(
                gene_order, config.window_length,
                "runmeans" if config.smooth_method == "runmeans" else "pyramidinal")
        self._blocks = jnp.asarray(op.blocks)
        self._op_meta = (op.n_tiles, op.side_tiles, op.num_genes)
        # half-shifted K=256 weight layout for the Pallas smooth kernel
        # (single MXU contraction per output tile; see layout.shifted_blocks)
        self._w_shifted = (jnp.asarray(op.shifted_blocks())
                           if op.side_tiles == 1 and op.halfband <= 64
                           else None)
        # K=384 aligned stack for the single-kernel fused residual pass
        # (ops/residual_fused.py): counts -> residual in one HBM round-trip
        self._w_stacked = None
        if op.side_tiles == 1 and 32 % config.median_radix_bits == 0:
            from infercnv_tpu.ops.residual_fused import _pick_tile_r

            if _pick_tile_r(op.n_tiles * 128, op.n_tiles) > 0:
                self._w_stacked = jnp.asarray(op.stacked_blocks())
        # chromosome bin-packing + unpack map (shared with models/hmm.py —
        # ops/viterbi_pack.py is the single Viterbi implementation)
        self._layout = PackedLayout.from_gene_order(gene_order)
        self._means = jnp.asarray(hmm.means, jnp.float32)
        self._log_pi = jnp.asarray(hmm.log_pi(), jnp.float32)
        self._log_delta = jnp.asarray(np.log(hmm.delta()), jnp.float32)
        self._sigma = jnp.float32(np.median(hmm.sds))

        cell_sharding = None
        rep = None
        if mesh is not None:
            cell_sharding = NamedSharding(mesh, P("cells", None))
            rep = NamedSharding(mesh, P())
        self._cell_sharding = cell_sharding

        self._ref_stats = jax.jit(self._ref_stats_impl)
        self._ref_pass1 = jax.jit(self._ref_pass1_impl)
        self._ref_pass2 = jax.jit(self._ref_pass2_impl)
        self._ref_pass3 = jax.jit(self._ref_pass3_impl)
        if mesh is not None:
            # the chunk step has no cross-cell communication (ref stats are
            # precomputed and replicated), so it runs as one shard_map over
            # the cell axis — each shard executes the same fused program
            # (including the Pallas Viterbi on TPU)
            try:
                from jax import shard_map as _shard_map
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map as _shard_map

            def _smap(fn, in_specs, out_specs):
                # the transform/full steps are per-shard pure (no cross-cell
                # collectives; ref stats are precomputed and replicated), so
                # the vma check adds nothing; disabling it also lets
                # pallas_call run inside the shard without vma-annotated
                # out_shapes.  The subcluster step DOES psum its partial
                # group sums over the cell axis.
                kw = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
                try:
                    return _shard_map(fn, check_vma=False, **kw)
                except TypeError:  # pre-0.7 API
                    return _shard_map(fn, check_rep=False, **kw)

            base_in = (P("cells", None), P(), P(None, None), P(None, None))
            self._transform = jax.jit(_smap(self._transform_impl, base_in,
                                            P("cells", None)))
            self._full = jax.jit(_smap(self._full_impl, base_in + (P(),),
                                       (P("cells", None), P("cells", None))))

            def _sub_sharded(counts, nf, ml, mr, nb, onehot, gsum_acc, gcount_acc):
                # accumulators enter replicated; divide the incoming value by
                # the shard count so the psum over shards restores it exactly
                n_sh = mesh.shape["cells"]
                resid, gsums, gcounts = self._subcluster_chunk_impl(
                    counts, nf, ml, mr, nb, onehot,
                    gsum_acc / n_sh, gcount_acc / n_sh)
                # group partial sums ride ICI once per chunk
                gsums = jax.lax.psum(gsums, "cells")
                gcounts = jax.lax.psum(gcounts, "cells")
                return resid, gsums, gcounts

            self._subcluster_chunk = jax.jit(_smap(
                _sub_sharded, base_in + (P(), P(None, "cells"), P(), P()),
                (P("cells", None), P(), P())))
        else:
            self._transform = jax.jit(self._transform_impl)
            self._full = jax.jit(self._full_impl)
            self._subcluster_chunk = jax.jit(self._subcluster_chunk_impl)
        self._viterbi_rows = jax.jit(self._viterbi)

    # ------------------------------------------------------------------
    # numerics
    # ------------------------------------------------------------------

    def _smooth(self, x):
        n_tiles, side_tiles, num_genes = self._op_meta
        if self.use_pallas:
            if self._w_shifted is not None:
                from infercnv_tpu.ops.smoothing import _apply_banded_pallas_k256

                return _apply_banded_pallas_k256(
                    x, self._w_shifted, n_tiles, side_tiles, num_genes,
                    self._pallas_interpret,
                    matmul_dtype=self.config.matmul_dtype)
            from infercnv_tpu.ops.smoothing import _apply_banded_pallas_sides

            return _apply_banded_pallas_sides(
                x, self._blocks, n_tiles, side_tiles, num_genes,
                self._pallas_interpret)
        from infercnv_tpu.ops.smoothing import _apply_banded

        return _apply_banded(x, self._blocks, n_tiles, side_tiles, num_genes)

    def _residual(self, counts, norm_factor, ref_means_log, ref_means_resid,
                  out_dtype: str = "float32"):
        cfg = self.config
        from infercnv_tpu.ops.median import (
            median_center_residual_pallas,
            row_median,
            row_median_pallas,
        )

        counts = jnp.asarray(counts)  # u16/raw inputs stream at half bytes
        if not (self.use_pallas and self._w_stacked is not None):
            counts = counts.astype(jnp.float32)
        if self.use_pallas and self._w_stacked is not None:
            # the WHOLE pass as one band kernel: normalize+log2, bounds
            # subtract, clip, banded smooth, exact median, bounds, exp2 —
            # one HBM read + one write (see ops/residual_fused.py).  The
            # where-form bounds subtraction with min == max == mean is
            # bit-identical to x - mean, so the non-bounds config rides
            # the same kernel.
            from infercnv_tpu.ops.residual_fused import residual_fused_pallas

            n_tiles, _side, num_genes = self._op_meta
            if cfg.ref_subtract_use_bounds:
                b1min = jnp.min(ref_means_log, axis=0)
                b1max = jnp.max(ref_means_log, axis=0)
                b2min = jnp.min(ref_means_resid, axis=0)
                b2max = jnp.max(ref_means_resid, axis=0)
            else:
                b1min = b1max = jnp.mean(ref_means_log, axis=0)
                b2min = b2max = jnp.mean(ref_means_resid, axis=0)
            return residual_fused_pallas(
                counts, self._w_stacked, b1min, b1max, b2min, b2max,
                norm_factor, n_tiles, num_genes,
                D=cfg.median_radix_bits, mct=cfg.max_centered_threshold,
                center_mean=(cfg.center_method != "median"),
                matmul_dtype=cfg.matmul_dtype, out_dtype=out_dtype,
                interpret=self._pallas_interpret)
        cs = jnp.sum(counts, axis=1, keepdims=True)
        x = jnp.log2(counts / cs * norm_factor + 1.0)
        x = self._subtract(x, ref_means_log)
        x = jnp.clip(x, -cfg.max_centered_threshold, cfg.max_centered_threshold)
        if (self.use_pallas and self._w_shifted is not None
                and cfg.center_method == "median"
                and cfg.ref_subtract_use_bounds
                and cfg.matmul_dtype == "float32"):  # bf16+fused measured
                # slower on v5e (Mosaic scheduling interaction)
            # FUSED tail: the smooth kernel's padded output feeds the
            # median+bounds+exp2 kernel directly — no slice/pad copies and
            # no XLA epilogue pass between them.  Measured NEUTRAL on v5e
            # (7.45 vs 7.42 ms per 8192-cell chunk: the radix select's VPU
            # compute dominates, not HBM traffic) — kept because it halves
            # the pass's HBM footprint, which pays on bandwidth-limited
            # parts and larger gene axes.
            from infercnv_tpu.ops.smoothing import _apply_banded_pallas_k256

            n_tiles, side_tiles, num_genes = self._op_meta
            yp = _apply_banded_pallas_k256(
                x, self._w_shifted, n_tiles, side_tiles, num_genes,
                self._pallas_interpret, matmul_dtype=cfg.matmul_dtype,
                padded_out=True)
            gmin = jnp.min(ref_means_resid, axis=0)
            gmax = jnp.max(ref_means_resid, axis=0)
            resid = median_center_residual_pallas(
                yp, gmin, gmax, num_genes, interpret=self._pallas_interpret)
            return resid[:, :num_genes].astype(jnp.dtype(out_dtype))
        x = self._smooth(x)
        if cfg.center_method == "median":
            # exact radix-select (no sort); the Pallas kernel keeps all 16
            # radix passes in VMEM (1 HBM sweep instead of 16)
            if self.use_pallas:
                med = row_median_pallas(x, interpret=self._pallas_interpret)
            else:
                med = row_median(x)
            x = x - med[:, None]
        else:
            x = x - jnp.mean(x, axis=1, keepdims=True)
        x = self._subtract(x, ref_means_resid)
        return jnp.exp2(x).astype(jnp.dtype(out_dtype))

    def _denoise(self, resid, noise_bounds):
        """clear_noise_via_ref_mean_sd (reference inferCNV_ops.R:2302-2346):
        values inside mean_ref +- mean(per-ref-cell sd) * sd_amplifier are
        zeroed to the reference mean.  noise_bounds = [mean_ref, spread]."""
        mean_ref, spread = noise_bounds[0], noise_bounds[1]
        inside = (resid > mean_ref - spread) & (resid < mean_ref + spread)
        return jnp.where(inside, mean_ref, resid)

    def _subtract(self, x, grp_means):
        if self.config.ref_subtract_use_bounds:
            gmin = jnp.min(grp_means, axis=0)
            gmax = jnp.max(grp_means, axis=0)
            out = jnp.where(x > gmax, x - gmax, 0.0)
            return jnp.where(x < gmin, x - gmin, out)
        return x - jnp.mean(grp_means, axis=0)

    def _viterbi(self, resid, sigma_rows=None):
        """Per-cell Viterbi over bin-packed chromosomes (the shared
        ops/viterbi_pack.py implementation).  resid: [C, G]; sigma_rows:
        optional [C] per-row emission sigma (subcluster-mode rows carry the
        hspike cell-count-trend sigma; per-cell mode uses the median hspike
        sigma)."""
        C = resid.shape[0]
        if sigma_rows is None:
            sigma_rows = jnp.full((C,), self._sigma, jnp.float32)
        return viterbi_packed(
            resid, self._layout, self._means, sigma_rows,
            self._log_pi, self._log_delta,
            np.asarray(self.hmm.means), self.hmm.t,
            use_pallas=self.use_pallas, interpret=self._pallas_interpret,
            unroll=self._scan_unroll)

    # ------------------------------------------------------------------
    # jitted entry points
    # ------------------------------------------------------------------

    def _ref_stats_impl(self, ref_counts, norm_factor, group_onehot):
        """Stage statistics from the reference cells.

        group_onehot: [K, R] one-hot membership of each reference cell in its
        reference group — with K > 1 the bounds subtraction uses the per-group
        gene means exactly as the reference's multi-group ``.subtract_expr``
        (R/inferCNV_ops.R:1742-1786: values inside [min, max] of the K group
        means go to 0, outside subtract the nearest bound).

        Returns (ref_means_log [K, G], ref_means_resid [K, G],
        noise_bounds [2] = (mean_ref, sd spread * amplifier))."""
        cs = jnp.sum(ref_counts, axis=1, keepdims=True)
        xlog = jnp.log2(ref_counts / cs * norm_factor + 1.0)
        gsum = group_onehot @ xlog                                  # [K, G]
        gn = jnp.sum(group_onehot, axis=1, keepdims=True)
        ref_means_log = gsum / gn
        # run the refs through the first half to get residual-stage means
        x = self._subtract(xlog, ref_means_log)
        x = jnp.clip(x, -self.config.max_centered_threshold,
                     self.config.max_centered_threshold)
        x = self._smooth(x)
        if self.config.center_method == "median":
            x = x - jnp.median(x, axis=1, keepdims=True)
        else:
            x = x - jnp.mean(x, axis=1, keepdims=True)
        ref_means_resid = (group_onehot @ x) / gn
        # denoise bounds on the final (pooled) reference residuals
        # (clear_noise_via_ref_mean_sd pools all reference cells :2302-2346)
        final = jnp.exp2(self._subtract(x, ref_means_resid))
        mean_ref = jnp.mean(final)
        sd_ref = jnp.mean(jnp.std(final, axis=1, ddof=1)) * self.config.sd_amplifier
        return ref_means_log, ref_means_resid, jnp.stack([mean_ref, sd_ref])

    # -- streamed ref stats (the one-shot program holds several [R, G]
    # temporaries; at 1M cells the 200k reference rows alone exceed HBM,
    # so the statistics accumulate over cell chunks in three passes) -----

    def _ref_pass1_impl(self, counts, norm_factor, onehot_c):
        cs = jnp.sum(counts.astype(jnp.float32), axis=1, keepdims=True)
        xlog = jnp.log2(counts / cs * norm_factor + 1.0)
        return onehot_c @ xlog                                      # [K, G]

    def _ref_stage2_x(self, counts, norm_factor, ref_means_log):
        cs = jnp.sum(counts.astype(jnp.float32), axis=1, keepdims=True)
        xlog = jnp.log2(counts / cs * norm_factor + 1.0)
        x = self._subtract(xlog, ref_means_log)
        x = jnp.clip(x, -self.config.max_centered_threshold,
                     self.config.max_centered_threshold)
        x = self._smooth(x)
        if self.config.center_method == "median":
            return x - jnp.median(x, axis=1, keepdims=True)
        return x - jnp.mean(x, axis=1, keepdims=True)

    def _ref_pass2_impl(self, counts, norm_factor, ref_means_log, onehot_c):
        return onehot_c @ self._ref_stage2_x(counts, norm_factor, ref_means_log)

    def _ref_pass3_impl(self, counts, norm_factor, ref_means_log,
                        ref_means_resid, row_mask):
        x = self._ref_stage2_x(counts, norm_factor, ref_means_log)
        final = jnp.exp2(self._subtract(x, ref_means_resid))
        m = row_mask[:, None]
        total = jnp.sum(final * m)
        sd_sum = jnp.sum(jnp.std(final, axis=1, ddof=1) * row_mask)
        return total, sd_sum

    def _ref_stats_streamed(self, ref_counts, norm_factor, group_onehot,
                            chunk: int = 16384):
        """ref_stats accumulated over cell chunks — same statistics as the
        one-shot program (accumulation order differs, so results agree to
        f32 rounding, not bitwise); used automatically when the reference
        block would not fit HBM."""
        R = ref_counts.shape[0]
        G = self.gene_order.num_genes
        K = group_onehot.shape[0]
        nf = jnp.float32(norm_factor)
        gn = np.asarray(group_onehot, np.float32).sum(axis=1)[:, None]

        def chunks():
            for b in range(0, R, chunk):
                c = np.asarray(ref_counts[b:b + chunk])
                oh = np.ascontiguousarray(group_onehot[:, b:b + chunk],
                                          dtype=np.float32)
                yield c, oh

        gsum = np.zeros((K, G), np.float64)
        for c, oh in chunks():
            gsum += np.asarray(self._ref_pass1(jnp.asarray(c), nf,
                                               jnp.asarray(oh)),
                               np.float64)
        ml = jnp.asarray((gsum / gn).astype(np.float32))
        gsum2 = np.zeros((K, G), np.float64)
        for c, oh in chunks():
            gsum2 += np.asarray(self._ref_pass2(jnp.asarray(c), nf, ml,
                                                jnp.asarray(oh)),
                                np.float64)
        mr = jnp.asarray((gsum2 / gn).astype(np.float32))
        total = 0.0
        sd_sum = 0.0
        for c, _oh in chunks():
            mask = jnp.ones((c.shape[0],), jnp.float32)
            t, s = self._ref_pass3(jnp.asarray(c), nf, ml, mr, mask)
            total += float(t)
            sd_sum += float(s)
        mean_ref = total / (R * G)
        sd_ref = (sd_sum / R) * self.config.sd_amplifier
        return ml, mr, jnp.asarray(np.array([mean_ref, sd_ref], np.float32))

    def _transform_impl(self, counts, norm_factor, ref_means_log, ref_means_resid):
        # only the transform path (download-bound product step) narrows;
        # _full/_subcluster consume the residual in-program and stay f32
        return self._residual(counts, norm_factor, ref_means_log,
                              ref_means_resid,
                              out_dtype=self.config.out_dtype)

    def _full_impl(self, counts, norm_factor, ref_means_log, ref_means_resid,
                   noise_bounds):
        resid = self._residual(counts, norm_factor, ref_means_log, ref_means_resid)
        states = self._viterbi(resid)  # HMM consumes the pre-denoise residual
        if self.config.denoise:
            resid = self._denoise(resid, noise_bounds)
        return resid, states

    def _subcluster_chunk_impl(self, counts, norm_factor, ref_means_log,
                               ref_means_resid, noise_bounds, group_onehot,
                               gsum_acc, gcount_acc):
        """Default-configuration streaming step (analysis_mode='subclusters'):
        residual transform + per-subcluster partial sums for the group-mean
        Viterbi (reference rowMeans at R/inferCNV_HMM.R:383) + denoised final
        matrix.  group_onehot: [K, C] chunk-local subcluster membership.

        The accumulators ride inside the step (one compiled program per
        chunk): a separate host-side `acc + new` launch would add a full
        dispatch round-trip per chunk, which dominates at streaming rates."""
        resid = self._residual(counts, norm_factor, ref_means_log, ref_means_resid)
        gsums = group_onehot @ resid                                # [K, G] on MXU
        gcounts = jnp.sum(group_onehot, axis=1)                     # [K]
        if self.config.denoise:
            resid = self._denoise(resid, noise_bounds)
        return resid, gsum_acc + gsums, gcount_acc + gcounts

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def ref_stats(self, ref_counts, norm_factor, group_onehot=None):
        """Per-reference-group gene means for both subtraction stages plus
        pooled denoise bounds.  group_onehot: [K, n_ref] membership (None =
        one pooled group, the refless/single-group case).

        Above ~2.5e8 reference elements (1 GB f32 input; the one-shot
        program needs ~6x that in HBM temporaries) the statistics stream
        over cell chunks instead (same math, f32-rounding-level agreement
        — accumulation order differs)."""
        if group_onehot is None:
            group_onehot = np.ones((1, ref_counts.shape[0]), np.float32)
        if int(np.prod(ref_counts.shape)) > 250_000_000:
            return self._ref_stats_streamed(
                ref_counts, norm_factor, np.asarray(group_onehot, np.float32))
        ref_counts = jnp.asarray(ref_counts, jnp.float32)
        return self._ref_stats(ref_counts, jnp.float32(norm_factor),
                               jnp.asarray(group_onehot, jnp.float32))

    def transform_chunk(self, counts, norm_factor, ref_means_log, ref_means_resid):
        """Pre-denoise residual matrix for one cell chunk (the step-14 state
        the HMM and subclustering consume)."""
        return self._transform(_counts_cast(counts),
                               jnp.float32(norm_factor), ref_means_log, ref_means_resid)

    def full_chunk(self, counts, norm_factor, ref_means_log, ref_means_resid,
                   noise_bounds=None):
        """Residual + per-cell HMM states for one cell chunk
        (analysis_mode='cells').  Viterbi always consumes the pre-denoise
        residual; with config.denoise and noise_bounds given, the returned
        matrix is denoised (noise_bounds=None leaves it raw)."""
        if noise_bounds is None:
            noise_bounds = jnp.zeros((2,), jnp.float32)  # no-op denoise
        return self._full(_counts_cast(counts), jnp.float32(norm_factor),
                          ref_means_log, ref_means_resid,
                          jnp.asarray(noise_bounds, jnp.float32))

    def subcluster_chunk(self, counts, norm_factor, ref_means_log,
                         ref_means_resid, noise_bounds, group_onehot,
                         acc=None):
        """Default-configuration streaming step (analysis_mode='subclusters'):
        returns (final resid [C, G] (denoised per config), accumulated
        subcluster sums [K, G], accumulated subcluster counts [K]).  Pass the
        previous call's (sums, counts) back via `acc` to accumulate across
        chunks in-program; divide at the end and call viterbi_group_means."""
        if noise_bounds is None:
            noise_bounds = jnp.zeros((2,), jnp.float32)
        group_onehot = jnp.asarray(group_onehot, jnp.float32)
        if acc is None:
            K = group_onehot.shape[0]
            G = self.gene_order.num_genes
            acc = (jnp.zeros((K, G), jnp.float32), jnp.zeros((K,), jnp.float32))
        return self._subcluster_chunk(
            _counts_cast(counts), jnp.float32(norm_factor),
            ref_means_log, ref_means_resid,
            jnp.asarray(noise_bounds, jnp.float32), group_onehot,
            acc[0], acc[1])

    def viterbi_group_means(self, group_means, n_cells_per_group=None,
                            trend_fits=None, levels=None):
        """Viterbi on subcluster mean rows (reference
        predict_CNV_via_HMM_on_tumor_subclusters R/inferCNV_HMM.R:345-408):
        per-group emission sigma follows the hspike cell-count trend
        (.get_state_emission_params :586-614) collapsed to the median over
        states (Viterbi.dthmm.adj :1122).  Returns states [K, G] (1-based)."""
        group_means = jnp.asarray(group_means, jnp.float32)
        K = group_means.shape[0]
        if trend_fits is not None and n_cells_per_group is not None:
            from infercnv_tpu.models.hmm import I6_LEVELS, state_emission_sds

            lv = levels if levels is not None else I6_LEVELS
            sigma_rows = np.array([
                float(np.median(state_emission_sds(int(n), trend_fits, lv)))
                for n in np.asarray(n_cells_per_group)], np.float32)
        else:
            sigma_rows = np.full((K,), float(self._sigma), np.float32)
        return self._viterbi_rows(group_means, jnp.asarray(sigma_rows))


def _counts_cast(counts):
    """Keep 16/32-bit integer counts in their narrow dtype (the fused
    residual kernel converts in VMEM, halving HBM/link traffic); anything
    else becomes float32 as before."""
    counts = jnp.asarray(counts)
    if counts.dtype in (jnp.uint16, jnp.int16, jnp.int32, jnp.uint32):
        return counts
    return counts.astype(jnp.float32)


def make_cell_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D device mesh over the cell axis."""
    devs = np.array(jax.devices()[: n_devices or len(jax.devices())])
    return Mesh(devs, axis_names=("cells",))
