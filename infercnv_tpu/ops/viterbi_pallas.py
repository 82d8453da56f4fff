"""Fused Viterbi as a Pallas TPU kernel.

One kernel pass per 128-sequence tile: emissions are computed on the fly,
the forward max-product runs with the [S, 128] score vector resident in
VMEM, backpointers stay in a VMEM scratch (never touching HBM), and the
backtrace writes the final states directly — eliminating the XLA path's
em_all materialization (~7 GB of HBM round-trips per 8k-cell chunk) and
backpointer traffic.

The transition structure is uniform (diag 1-(S-1)t, off-diag t — reference
.get_HMM R/inferCNV_HMM.R:230-265), so the max-product step needs only the
running max over states, not an SxS contraction:

    score_s = max(nu_s + log_diag,  max_j nu_j + log_off)

with the backpointer resolving ties to the smaller state index exactly as
R's which.max does.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
#: VMEM budget for picking the lane-tile width.  The kernel's footprint is
#: ~L * W * (2*4 x + S bp + 2*4 out + 2*4 bnd) bytes; the sequential
#: forward pass costs (B / W) * L iterations of [S, W] vector work, so the
#: WIDEST tile that fits VMEM minimizes the dependency-chain length (the
#: round-4 fixed 512-lane tile left the VPU issue-bound: 29 ms -> see
#: BENCHMARKS.md round 5 for the widened numbers).
_VMEM_BUDGET = 80 * 1024 * 1024
_TILE_B_MAX = 8192


def _pick_tile_b(L: int, S: int) -> int:
    per_lane = L * (2 * 4 + S + 2 * 4 + 2 * 4) + 64
    cap = _VMEM_BUDGET // per_lane
    tile = min(_TILE_B_MAX, (cap // LANE) * LANE)
    return max(tile, LANE)


# Chebyshev-derived polynomial of f(z) = -log Phi(-z) on z in [0, 6]
# (u = z/3 - 1; max relative error 5e-9, i.e. exact at float32), plus the
# 4-term asymptotic expansion beyond — needed because `erf` has no Pallas
# TPU lowering.
_LOGSF_POLY = (
    6.6077262216734844, 9.849295972346816, 4.182483637492412,
    0.14161773540308858, -0.06389011554893194, 0.02750005245776225,
    -0.010807058987670455, 0.003606634430994035, -0.0008351692702736372,
    5.6785208915892025e-06, 0.00016607633590841293, -0.0002004534568855845,
    0.00012466292805241087, -1.4737718057576076e-05, -1.018850375361854e-05,
)
_HALF_LOG_2PI = 0.9189385332046727


def _log_sf_std_normal(z):
    """log P(Z > z) for z >= 0, float32-stable without erf (matches
    jax.scipy.special.log_ndtr(-z) to ~1e-7 relative)."""
    u = z * (1.0 / 3.0) - 1.0
    poly = jnp.float32(_LOGSF_POLY[-1])
    for c in _LOGSF_POLY[-2::-1]:
        poly = poly * u + jnp.float32(c)
    zc = jnp.maximum(z, 6.0)
    inv2 = 1.0 / (zc * zc)
    series = 1.0 + inv2 * (-1.0 + inv2 * (3.0 + inv2 * (-15.0 + inv2 * 105.0)))
    asym = 0.5 * zc * zc + jnp.log(zc) + _HALF_LOG_2PI - jnp.log(series)
    return -jnp.where(z < 6.0, poly, asym)


def _viterbi_kernel(x_ref, len_ref, sigma_ref, params_ref, bnd_ref, out_ref,
                    bp_ref, nu_ref, *, S, L, log_diag, log_off):
    """x_ref: [L, 128] f32; len_ref: [1, 128] i32 (valid length per seq);
    sigma_ref: [1, 128] f32; params_ref: [16, 128] f32 packing the state
    means (rows 0..S-1, lane-replicated) and log_delta (rows 8..8+S-1);
    bnd_ref: [L, 128] f32 segment-start flags (several independent
    chromosomes may be concatenated in one sequence; a 1 at position i
    restarts the chain there — see viterbi_pallas docstring);
    out_ref: [L, 128] i32 states (1-based);
    scratch: bp_ref [L, S, 128] i8 backpointers — at restart positions the
    backpointers are meaningless, so row 0 there instead stores the argmax
    of nu *before* the restart (the previous segment's final state), read
    back when the backtrace crosses the restart; nu_ref [S, 128] f32.

    Every intermediate is kept rank-2: rank-1 vectors (row indexing,
    keepdims reductions, [None, :] reshapes) crash Mosaic's
    VectorLayoutInferer::inferReshape on current libtpu, so axis-0
    reductions over the small state dim are unrolled into static row
    slices instead."""
    W = x_ref.shape[1]
    sigma = sigma_ref[:, :]                 # [1, W]
    lens = len_ref[:, :]                    # [1, W] i32
    means_arr = params_ref[0:S, :]          # [S, W]
    log_delta_arr = params_ref[8:8 + S, :]  # [S, W]
    sidx = jax.lax.broadcasted_iota(jnp.int32, (S, W), 0)

    def _sum_s(a):                          # axis-0 sum of [S, W] -> [1, W]
        out = a[0:1, :]
        for s in range(1, S):
            out = out + a[s:s + 1, :]
        return out

    def _max_argmax_s(a):                   # first-max semantics (R which.max)
        m = a[0:1, :]
        am = jnp.zeros_like(m, jnp.int32)
        for s in range(1, S):
            row = a[s:s + 1, :]
            better = row > m
            m = jnp.where(better, row, m)
            am = jnp.where(better, s, am)
        return m, am                        # [1, W], [1, W]

    def emission(xrow):                     # xrow [1, W]
        # unnormalized log pseudo-emission -log(-logsf): the per-position
        # normalizer is state-constant, so max-product decisions are
        # identical (see models/hmm.py emission note); this halves the
        # in-loop transcendental work (no reciprocal/sum/divide)
        z = jnp.abs(xrow - means_arr) / sigma
        logp = _log_sf_std_normal(z)
        return -jnp.log(-logp)              # [S, W]

    nu_ref[:, :] = log_delta_arr + emission(x_ref[pl.ds(0, 1), :])
    bp_ref[0] = sidx.astype(jnp.int8)

    def fwd(i, _):
        nu = nu_ref[:, :]
        em = emission(x_ref[pl.ds(i, 1), :])
        m_all, a_all = _max_argmax_s(nu)                      # [1, 128] each
        stay = nu + log_diag
        move = m_all + log_off
        best = jnp.maximum(stay, move)
        # tie resolution identical to R which.max (first index wins)
        bp = jnp.where(
            stay > move, sidx,
            jnp.where(move > stay,
                      jnp.broadcast_to(a_all, (S, W)),
                      jnp.minimum(sidx, jnp.broadcast_to(a_all, (S, W)))),
        ).astype(jnp.int8)
        bnd = bnd_ref[pl.ds(i, 1), :] > 0.0                    # [1, 128]
        valid = i < lens                                       # [1, 128]
        # segment restart: fresh chain (delta + em); backpointers unused
        # there, so row 0 stores the previous segment's final state
        # (argmax of nu before the restart) for the backtrace
        nu_next = jnp.where(bnd, log_delta_arr + em, best + em)
        nu_ref[:, :] = jnp.where(valid, nu_next, nu)
        bp_bnd = jnp.where(sidx == 0, jnp.broadcast_to(a_all, (S, W)),
                           sidx).astype(jnp.int8)
        bp = jnp.where(bnd, bp_bnd, bp)
        bp_ref[i] = jnp.where(valid, bp, sidx.astype(jnp.int8))
        return 0

    jax.lax.fori_loop(1, L, fwd, 0)

    # backtrace: start at each sequence's last valid position; positions at
    # or beyond the length are filled during the sweep by carrying y through
    # identity backpointers (padded bp rows were written as identity).
    _, y_last = _max_argmax_s(nu_ref[:, :])                    # [1, 128]
    out_ref[pl.ds(L - 1, 1), :] = y_last + 1

    def bwd(k, y):                                             # y [1, 128]
        i = L - 2 - k
        bp = bp_ref[i + 1].astype(jnp.int32)                   # [S, 128]
        y_bp = _sum_s(jnp.where(sidx == y, bp, 0))             # bp row picked by y
        # crossing a segment start backwards: position i is the END of the
        # previous segment -> its own argmax, stashed in bp row 0 at i+1
        y_am = bp[0:1, :]
        bnd = bnd_ref[pl.ds(i + 1, 1), :] > 0.0                # [1, 128]
        y_new = jnp.where(bnd, y_am, y_bp)
        out_ref[pl.ds(i, 1), :] = y_new + 1
        return y_new

    jax.lax.fori_loop(0, L - 1, bwd, y_last)


@functools.partial(jax.jit, static_argnames=(
    "S", "L", "interpret", "means", "log_pi_diag", "log_pi_off", "log_delta"))
def _viterbi_pallas_call(x_lb, lens, sigma, bnd_lb, means, log_pi_diag,
                         log_pi_off, log_delta, S: int, L: int,
                         interpret: bool = False):
    B = x_lb.shape[1]
    # widest LANE-multiple tile that fits VMEM and divides B (the caller
    # pads B to a LANE multiple, so this terminates at LANE)
    tile_b = max(LANE, min(_pick_tile_b(L, S), (B // LANE) * LANE))
    while B % tile_b:
        tile_b -= LANE
    n_tiles = B // tile_b
    kernel = functools.partial(
        _viterbi_kernel, S=S, L=L,
        log_diag=float(log_pi_diag), log_off=float(log_pi_off),
    )
    params = np.zeros((16, tile_b), np.float32)
    for s_i, m in enumerate(means):
        params[s_i, :] = m
    for s_i, d in enumerate(log_delta):
        params[8 + s_i, :] = d
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, B), jnp.int32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((L, tile_b), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_b), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, tile_b), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, tile_b), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, tile_b), lambda b: (0, b), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((L, S, tile_b), jnp.int8),
            pltpu.VMEM((S, tile_b), jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
    )(x_lb, lens.reshape(1, B), sigma.reshape(1, B), jnp.asarray(params),
      bnd_lb.astype(jnp.float32))


def viterbi_pallas(x_bl: np.ndarray, lengths: np.ndarray, sigma: np.ndarray,
                   means: np.ndarray, t: float = 1e-6,
                   boundaries: Optional[np.ndarray] = None,
                   interpret: bool = False) -> jax.Array:
    """Viterbi over B padded sequences.

    x_bl: [B, L] observations; lengths: [B] valid lengths; sigma: [B]
    (median-collapsed per sequence); means: [S] state means.

    boundaries: optional [B, L] flags marking positions that START a new
    independent segment (chain restart with the start distribution) —
    lets several chromosomes be concatenated into one padded sequence so
    the sequential scan runs over ~sum(len) instead of n_chr * max(len).
    Results are identical to running each segment separately.

    Returns [B, L] 1-based states.  Set interpret=True off-TPU.
    """
    x_bl = jnp.asarray(x_bl, jnp.float32)
    B, L = x_bl.shape
    S = int(np.asarray(means).shape[0])
    if boundaries is None:
        bnd = jnp.zeros((B, L), jnp.int8)
    else:
        bnd = jnp.asarray(boundaries, jnp.int8)
    pad = (-B) % LANE
    if pad:
        x_bl = jnp.pad(x_bl, ((0, pad), (0, 0)))
        bnd = jnp.pad(bnd, ((0, pad), (0, 0)))
        lengths = jnp.pad(jnp.asarray(lengths, jnp.int32), (0, pad),
                          constant_values=1)
        sigma = jnp.pad(jnp.asarray(sigma, jnp.float32), (0, pad),
                        constant_values=1.0)
    else:
        lengths = jnp.asarray(lengths, jnp.int32)
        sigma = jnp.asarray(sigma, jnp.float32)
    log_diag = float(np.log1p(-(S - 1) * t))
    log_off = float(np.log(t))
    delta = np.full(S, t)
    delta[(S - 1) // 2] = 1.0 - (S - 1) * t
    states = _viterbi_pallas_call(
        x_bl.T, lengths, sigma, bnd.T,
        tuple(np.asarray(means, np.float64)),
        log_diag, log_off, tuple(np.log(delta)), S, L, interpret)
    return states.T[:B]
