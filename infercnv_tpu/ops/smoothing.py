"""Chromosome-ordered smoothing (the reference's hot loop #1) on TPU.

reference: smooth_by_chromosome (R/inferCNV_ops.R:2406-2434, 'pyramidinal'
via .smooth_helper/.smooth_center_helper :2483-2532/:2640-2661),
smooth_by_chromosome_runmeans (:2679-2704), and
smooth_by_chromosome_coordinates (:2534-2622).

All three are expressed as one banded linear operator over the gene axis
(see ops/layout.py) and applied as tiled 128x128 matmuls — MXU work with a
single pass over HBM, instead of the reference's per-cell scalar loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from infercnv_tpu.ops.layout import (
    LANE,
    BandedGeneOperator,
    coordinate_smoothing_operator,
    smoothing_operator,
)


@functools.partial(jax.jit, static_argnames=("n_tiles", "side_tiles", "num_genes"))
def _apply_banded(x: jax.Array, blocks: jax.Array, n_tiles: int, side_tiles: int,
                  num_genes: int) -> jax.Array:
    """y[:, tile j] = sum_s x[:, tile j+s] @ blocks[s][j].  x: [C, G]."""
    C = x.shape[0]
    padded = n_tiles * LANE
    xp = jnp.zeros((C, padded), x.dtype).at[:, :num_genes].set(x)
    xt = xp.reshape(C, n_tiles, LANE)
    out = jnp.zeros((C, n_tiles, LANE), jnp.float32)
    for s in range(-side_tiles, side_tiles + 1):
        if s == 0:
            xs = xt
        elif s > 0:
            xs = jnp.concatenate([xt[:, s:], jnp.zeros((C, s, LANE), x.dtype)], axis=1)
        else:
            xs = jnp.concatenate([jnp.zeros((C, -s, LANE), x.dtype), xt[:, :s]], axis=1)
        out = out + jnp.einsum(
            "ctg,tgh->cth", xs, blocks[s + side_tiles],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    return out.reshape(C, padded)[:, :num_genes]


def apply_banded_operator(x, op: BandedGeneOperator) -> jax.Array:
    return _apply_banded(
        jnp.asarray(x, jnp.float32), jnp.asarray(op.blocks),
        op.n_tiles, op.side_tiles, op.num_genes,
    )


# ---------------------------------------------------------------------------
# Pallas kernels: the banded apply as explicit VMEM-tiled MXU work.
#
# The XLA formulation above materializes each shifted copy of x (3 full
# HBM round-trips of concat padding) and re-reads the accumulator per
# side; the kernels below stream each x tile into VMEM once per output
# tile and keep the accumulation in registers (8.3 ms -> 3.9 ms on an
# 8192 x 8448 chunk, v5e).  Grid order is (gene tile j outer, row tile r
# inner) so the per-j weight block stays resident across the row sweep.
# ---------------------------------------------------------------------------

_TILE_R = 2048  # rows per kernel instance (x blocks + weights ~2.2 MB VMEM)


def _smooth_kernel_k256(x0_ref, x1_ref, w_ref, out_ref):
    """Half-shifted single-contraction form: out tile j = [x(j-64..), K=256]
    @ w[j].  Exact same HIGHEST-precision f32 numerics as the XLA path."""
    xw = jnp.concatenate([x0_ref[:, :], x1_ref[:, :]], axis=1)
    out_ref[:, :] = jax.lax.dot_general(
        xw, w_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _smooth_kernel_k256_bf16(x0_ref, x1_ref, w_ref, out_ref):
    """bf16-multiply / f32-accumulate variant: ONE native MXU pass instead
    of the 6-pass f32 emulation (HIGHEST).  ~0.1% relative error on
    softmax-normalized pyramid weights — opt-in via
    EngineConfig.matmul_dtype='bfloat16' (the f32 default keeps the
    R-golden 1e-5 parity)."""
    xw = jnp.concatenate([x0_ref[:, :], x1_ref[:, :]], axis=1)
    out_ref[:, :] = jax.lax.dot_general(
        xw.astype(jnp.bfloat16), w_ref[0].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _smooth_kernel_sides(*refs, n_side):
    """General (2S+1)-sided form for wide bands (coordinates smoothing)."""
    xs, w_ref, out_ref = refs[:n_side], refs[n_side], refs[n_side + 1]
    acc = None
    for s in range(n_side):
        part = jax.lax.dot_general(
            xs[s][:, :], w_ref[0, s, :, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        acc = part if acc is None else acc + part
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("n_tiles", "side_tiles",
                                             "num_genes", "interpret",
                                             "matmul_dtype", "padded_out"))
def _apply_banded_pallas_k256(x, w_shifted, n_tiles: int, side_tiles: int,
                              num_genes: int, interpret: bool = False,
                              matmul_dtype: str = "float32",
                              padded_out: bool = False):
    """padded_out=True returns the raw [C, n_tiles*128] kernel output
    (padded gene columns are exact zeros — the operator blocks carry zero
    weights there) so a fused consumer (median_center_residual_pallas) can
    read it without the slice copy."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = x.shape[0]
    tile_r = _TILE_R if C >= _TILE_R else max(8, -(-C // 8) * 8)
    padc = (-C) % tile_r
    padded = n_tiles * LANE
    xp = jnp.zeros((C + padc, 64 + padded + 64), jnp.float32)
    xp = xp.at[:C, 64:64 + num_genes].set(x)
    kernel = (_smooth_kernel_k256_bf16 if matmul_dtype == "bfloat16"
              else _smooth_kernel_k256)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C + padc, padded), jnp.float32),
        grid=(n_tiles, (C + padc) // tile_r),
        in_specs=[
            pl.BlockSpec((tile_r, LANE), lambda j, r: (r, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, LANE), lambda j, r: (r, j + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * LANE, LANE), lambda j, r: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, LANE), lambda j, r: (r, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, xp, w_shifted)
    if padded_out:
        return out[:C]
    return out[:C, :num_genes]


@functools.partial(jax.jit, static_argnames=("n_tiles", "side_tiles",
                                             "num_genes", "interpret"))
def _apply_banded_pallas_sides(x, blocks, n_tiles: int, side_tiles: int,
                               num_genes: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = x.shape[0]
    S = side_tiles
    n_side = 2 * S + 1
    # VMEM: (n_side input + 1 output) double-buffered [tile_r, 128] f32
    # blocks plus the [n_side, 128, 128] weight tile; bound tile_r so a
    # wide coordinate-smoothing band (large side_tiles) stays inside the
    # default scoped-VMEM budget instead of failing to compile.
    budget = 12 * 1024 * 1024
    cap = budget // (2 * (n_side + 1) * LANE * 4)
    tile_r = min(_TILE_R, max(8, (cap // 8) * 8))
    if C < tile_r:
        tile_r = max(8, -(-C // 8) * 8)
    padc = (-C) % tile_r
    padded = n_tiles * LANE
    xp = jnp.zeros((C + padc, S * LANE + padded + S * LANE), jnp.float32)
    xp = xp.at[:C, S * LANE:S * LANE + num_genes].set(x)
    w = jnp.transpose(blocks, (1, 0, 2, 3))      # [T, 2S+1, 128, 128]
    in_specs = [
        pl.BlockSpec((tile_r, LANE),
                     functools.partial(lambda s, j, r: (r, j + s), s),
                     memory_space=pltpu.VMEM)
        for s in range(n_side)
    ]
    in_specs.append(pl.BlockSpec((1, n_side, LANE, LANE),
                                 lambda j, r: (j, 0, 0, 0),
                                 memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_smooth_kernel_sides, n_side=n_side),
        out_shape=jax.ShapeDtypeStruct((C + padc, padded), jnp.float32),
        grid=(n_tiles, (C + padc) // tile_r),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_r, LANE), lambda j, r: (r, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*([xp] * n_side + [w]))
    return out[:C, :num_genes]


def apply_banded_operator_pallas(x, op: BandedGeneOperator,
                                 interpret: bool = False) -> jax.Array:
    """Pallas-tiled banded apply; same HIGHEST-precision f32 math as
    apply_banded_operator (accumulation grouping differs, so results can
    deviate by ~1e-7 — both are exact to float32 rounding of the band)."""
    x = jnp.asarray(x, jnp.float32)
    if op.side_tiles == 1 and op.halfband <= 64:
        return _apply_banded_pallas_k256(
            x, jnp.asarray(op.shifted_blocks()),
            op.n_tiles, op.side_tiles, op.num_genes, interpret)
    return _apply_banded_pallas_sides(
        x, jnp.asarray(op.blocks),
        op.n_tiles, op.side_tiles, op.num_genes, interpret)


def smooth_by_chromosome(x, gene_order, window_length: int = 101,
                         method: str = "pyramidinal") -> jax.Array:
    """Smooth [C, G] expression along the genomically ordered gene axis.

    method: 'pyramidinal' (triangular window, renormalized at chromosome
    ends) or 'runmeans' (flat window, same end handling — caTools::runmean
    endrule='mean').
    """
    op = smoothing_operator(gene_order, window_length, method)
    return apply_banded_operator(x, op)


def smooth_by_chromosome_coordinates(x, gene_order, window_length: int = 10_000_000) -> jax.Array:
    op = coordinate_smoothing_operator(gene_order, window_length)
    return apply_banded_operator(x, op)


# ---------------------------------------------------------------------------
# Host-side exact reference implementation (float64) for golden tests.
# ---------------------------------------------------------------------------

def smooth_window_reference(x_gc: np.ndarray, window_length: int) -> np.ndarray:
    """Direct float64 implementation of the single-chromosome smoother on a
    [G, C] matrix (the orientation the reference's .smooth_window uses).

    y[g] = sum k[d] x[g+d] / sum k[d] over in-range taps — algebraically
    identical to .smooth_helper's interior filter + end renormalization
    (denominator ((w-1)/2)^2 + w - r_l(r_l+1)/2 - r_r(r_r+1)/2 equals the sum
    of the included triangular weights).
    """
    if window_length < 2:
        return x_gc.copy()
    t = (window_length - 1) // 2
    k = np.concatenate([np.arange(1, t + 1), [t + 1], np.arange(t, 0, -1)]).astype(np.float64)
    G = x_gc.shape[0]
    out = np.empty_like(x_gc, np.float64)
    for g in range(G):
        lo = max(0, g - t)
        hi = min(G, g + t + 1)
        seg = k[(lo - g) + t:(hi - g) + t]
        out[g] = (x_gc[lo:hi].T @ seg) / seg.sum()
    return out
