"""Exact row-median via bit-space radix select.

``jnp.median`` lowers to a full per-row sort (~68 ms per 8k x 8.5k chunk on
v5e); the median only needs two order statistics.  Mapping float32 to its
order-preserving uint32 key and radix-searching the 32 bits finds the k-th
statistic exactly — numerically identical to numpy/R medians (exact float
equality, no interpolation error) for all normal float32 inputs; subnormal
inputs are flushed to zero (TPU FTZ), identically in both paths below.

Two implementations:

* ``row_median`` — pure XLA.  The search digit size trades HBM passes for
  VPU compares: 1 bit/pass = 32 data reads (15.0 ms on the 8k x 8.5k
  chunk), 2 bits/pass = 16 reads with 3 fused compare+reduce each
  (9.0 ms), 4 bits/pass = 8 reads x 15 compares (10.5 ms, compute-bound).
  2 bits/pass is the measured optimum on v5e.
* ``row_median_pallas`` — Pallas TPU kernel: a row tile is DMA'd to VMEM
  once and ALL 16 radix passes run on-chip, turning 16 HBM sweeps into
  one (2.9 ms on the same chunk; still exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _to_key(v):
    u = jax.lax.bitcast_convert_type(v, jnp.uint32)
    neg = (u >> 31) == 1
    return jnp.where(neg, ~u, u | jnp.uint32(0x80000000))


def _from_key(kk):
    pos = (kk >> 31) == 1
    uu = jnp.where(pos, kk & jnp.uint32(0x7FFFFFFF), ~kk)
    return jax.lax.bitcast_convert_type(uu, jnp.float32)


def row_median(v, bits_per_pass: int = 2) -> jax.Array:
    """Exact median along the last axis of a float32 array [..., n].
    Matches numpy.median (mean of the two middle values for even n)."""
    v = jnp.asarray(v, jnp.float32)
    n = v.shape[-1]
    key = _to_key(v)
    k2 = n // 2  # 0-based upper-middle order statistic
    res = jnp.zeros(v.shape[:-1] + (1,), jnp.uint32)
    D = bits_per_pass
    assert 32 % D == 0
    T = (1 << D) - 1
    for p in range(32 // D - 1, -1, -1):
        shift = p * D
        # all 2^D - 1 digit candidates counted in one fused read of `key`
        cnts = [jnp.sum((key < (res | jnp.uint32(j << shift))).astype(jnp.int32),
                        axis=-1, keepdims=True) for j in range(1, T + 1)]
        best = res
        for j in range(1, T + 1):
            cand = res | jnp.uint32(j << shift)
            best = jnp.where(cnts[j - 1] <= k2, cand, best)
        res = best
    v2 = res
    if n % 2 == 1:
        return _from_key(v2)[..., 0]
    cnt_lt = jnp.sum((key < v2).astype(jnp.int32), axis=-1, keepdims=True)
    m = jnp.max(jnp.where(key < v2, key, jnp.uint32(0)), axis=-1, keepdims=True)
    v1 = jnp.where(cnt_lt < k2, v2, m)
    return ((_from_key(v1) + _from_key(v2)) * 0.5)[..., 0]


# ---------------------------------------------------------------------------
# Pallas kernel: whole radix select in VMEM, one HBM read.
# ---------------------------------------------------------------------------

LANE = 128
_TILE_R = 128  # rows per kernel instance; x + key + temps stay in VMEM
_VMEM_BUDGET = 28 * 1024 * 1024  # keep under the 32 MB vmem_limit_bytes
_BYTES_PER_ELT = 12  # f32 x + uint32 key + compare temps per element


def _pick_tile_r(C: int, Gp: int, bytes_per_elt: int = _BYTES_PER_ELT) -> int:
    """Largest row-tile (multiple of 8, <= _TILE_R) whose VMEM footprint
    fits the budget; 0 if even 8 rows do not fit — the caller then falls
    back to the XLA row_median."""
    cap = _VMEM_BUDGET // (bytes_per_elt * Gp)
    tile = min(_TILE_R, (cap // 8) * 8)
    if C < tile:
        tile = max(8, -(-C // 8) * 8)
        if bytes_per_elt * tile * Gp > _VMEM_BUDGET:
            return 0
    return tile if tile >= 8 else 0


def _median_kernel(x_ref, out_ref, *, n, D):
    """x_ref: [R, Gp] f32 (cols >= n hold +inf); out_ref: [R, 128] f32
    (median broadcast across lanes; caller reads lane 0).  The select
    itself is the ONE shared implementation in ops/residual_fused.py
    (the physical +inf padding and the helper's iota mask produce the
    same keys)."""
    from infercnv_tpu.ops.residual_fused import radix_median_rows

    x = x_ref[:, :]
    R = x.shape[0]
    med = radix_median_rows(x, n, D)
    out_ref[:, :] = jnp.broadcast_to(med, (R, LANE))


def _median_epilogue_kernel(x_ref, gmin_ref, gmax_ref, out_ref, *, n, D):
    """Fused tail of the engine residual: exact row median (radix select in
    VMEM, exactly _median_kernel's math with columns >= n masked), then —
    while the tile is still resident — the median subtraction, the
    reference-bounds subtraction, and exp2, writing the FINAL residual
    tile.  Saves two full HBM round-trips per chunk vs median kernel +
    XLA epilogue (the slice/pad copies between them plus the epilogue's
    own read+write)."""
    from infercnv_tpu.ops.residual_fused import radix_median_rows

    x = x_ref[:, :]
    med = radix_median_rows(x, n, D)
    y = x - med                                  # identical op order to the
    gmin = gmin_ref[0]                           # XLA epilogue it replaces
    gmax = gmax_ref[0]
    out = jnp.where(y > gmax, y - gmax, 0.0)
    out = jnp.where(y < gmin, y - gmin, out)
    out_ref[:, :] = jnp.exp2(out)


@functools.partial(jax.jit, static_argnames=("num_genes", "interpret"))
def median_center_residual_pallas(yp, gmin, gmax, num_genes: int,
                                  interpret: bool = False) -> jax.Array:
    """Fused residual tail on a PADDED [C, Gp] smooth output (columns >=
    num_genes ignored): per-row exact median subtraction + reference
    bounds subtraction + exp2, one VMEM round-trip.  Returns [C, Gp]
    (padded columns carry don't-care values; the caller slices)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    yp = jnp.asarray(yp, jnp.float32)
    C, Gp = yp.shape
    tile_r = _pick_tile_r(C, Gp, bytes_per_elt=16)  # + the residual out tile
    if tile_r == 0:
        # fall back to the unfused ops (huge G): compute on the valid
        # columns, return re-padded to the caller's Gp width
        yv = yp[:, :num_genes]
        med = row_median(yv)
        y = yv - med[:, None]
        gmin = jnp.asarray(gmin, jnp.float32)[None, :]
        gmax = jnp.asarray(gmax, jnp.float32)[None, :]
        out = jnp.where(y > gmax, y - gmax, 0.0)
        out = jnp.where(y < gmin, y - gmin, out)
        out = jnp.exp2(out)
        return jnp.pad(out, ((0, 0), (0, Gp - num_genes)))
    padc = (-C) % tile_r
    ypp = jnp.pad(yp, ((0, padc), (0, 0))) if padc else yp
    gpad = jnp.zeros((Gp,), jnp.float32)
    gminp = gpad.at[:num_genes].set(jnp.asarray(gmin, jnp.float32)[:Gp])[None]
    gmaxp = gpad.at[:num_genes].set(jnp.asarray(gmax, jnp.float32)[:Gp])[None]
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024)
    out = pl.pallas_call(
        functools.partial(_median_epilogue_kernel, n=num_genes, D=2),
        out_shape=jax.ShapeDtypeStruct((C + padc, Gp), jnp.float32),
        grid=((C + padc) // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, Gp), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, Gp), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **kwargs,
    )(ypp, gminp, gmaxp)
    return out[:C]


@functools.partial(jax.jit, static_argnames=("interpret",))
def row_median_pallas(v, interpret: bool = False) -> jax.Array:
    """Exact row median of a [C, G] float32 array as one Pallas pass.

    Bit-identical to ``row_median`` (and to numpy.median for all normal
    float32 inputs; subnormal values are flushed to zero by both TPU
    paths, which keeps the two implementations mutually exact but not
    numpy-identical on subnormals).  The row tile lives in VMEM for all
    16 radix passes, so HBM sees the data once (~3x the XLA variant's
    throughput on v5e).  The row tile shrinks as G grows to stay inside
    the VMEM budget; when even an 8-row tile cannot fit (G beyond
    ~290k), this transparently falls back to the XLA ``row_median``.
    ``interpret=True`` runs the kernel interpreted off-TPU (tests)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    v = jnp.asarray(v, jnp.float32)
    C, G = v.shape
    tile_r = _pick_tile_r(C, G + ((-G) % LANE))
    if tile_r == 0:
        return row_median(v)
    padc = (-C) % tile_r
    padg = (-G) % LANE
    vp = jnp.pad(v, ((0, padc), (0, padg)), constant_values=jnp.inf)
    Cp, Gp = vp.shape
    kwargs = {}
    if not interpret:
        # x + uint32 key + compare temps exceed the default 16 MB scoped
        # vmem at this tile size; 32 MB is measured fastest on v5e
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024)
    out = pl.pallas_call(
        functools.partial(_median_kernel, n=G, D=2),
        out_shape=jax.ShapeDtypeStruct((Cp, LANE), jnp.float32),
        grid=(Cp // tile_r,),
        in_specs=[pl.BlockSpec((tile_r, Gp), lambda r: (r, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile_r, LANE), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **kwargs,
    )(vp)
    return out[:C, 0]
