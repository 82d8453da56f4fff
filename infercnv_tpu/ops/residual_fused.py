"""The WHOLE default residual pass as one Pallas TPU kernel.

Counts in, final (pre-denoise) residual out — one HBM read, one HBM
write.  Fuses, over a contiguous row band held in VMEM:

  1. depth normalization + log2          (reference R/inferCNV_ops.R:1999)
  2. reference bounds subtraction        (.subtract_expr :1742-1786)
  3. symmetric clipping                  (:1806-1838)
  4. chromosome-banded smooth as 66 unrolled K=256 MXU contractions
                                         (smooth_by_chromosome :2406-2434)
  5. exact per-cell median re-centering via bit-space radix select
                                         (:2094-2109)
  6. residual-stage bounds subtraction + exp2 (invert log :2240-2266)

Why a band layout: the previous kernels tiled [rows, 128-gene] blocks, so
every DMA moved 512-byte strided segments (~300 GB/s sustained on v5e vs
the ~819 GB/s roofline) and the pass crossed HBM three times (smooth out,
median in, epilogue out).  Holding [R, ALL genes] rows contiguously makes
every transfer a full cache-line stream and removes both intermediate
round-trips; the measured chunk time drops accordingly (see
BENCHMARKS.md round 5).

Numerics are IDENTICAL in structure to the unfused path (same op order,
same radix select); elementwise transcendentals (log2/exp2) lower through
Mosaic instead of XLA, which can differ by ~1 ulp — inside every parity
tolerance used by the golden tests (the shipped fused epilogue already
runs exp2 under Mosaic by default).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LANE = 128
#: working-set budget against the 64 MB vmem_limit_bytes the kernel
#: compiles with (the gap covers Mosaic-internal temporaries of the radix
#: select); the weight stack is charged explicitly in _pick_tile_r
_VMEM_BUDGET = 40 * 1024 * 1024


def radix_median_rows(y, n: int, D: int):
    """Exact row median of a VMEM-resident [R, Gp] f32 tile, columns >= n
    ignored.  Bit-identical to ops.median.row_median (numpy median
    semantics: mean of the two middle values for even n).  Returns [R, 1].

    Shared by the standalone median kernels and the fused residual kernel;
    ``D`` bits are resolved per pass (1 or 2 measured best on v5e — see
    BENCHMARKS.md round 5 for the A/B)."""
    R, Gp = y.shape
    u = jax.lax.bitcast_convert_type(y, jnp.uint32)
    neg = (u >> 31) == 1
    key = jnp.where(neg, ~u, u | jnp.uint32(0x80000000))
    if n != Gp:
        # +inf key for padded columns: same select result as physically
        # padding with +inf
        col = jax.lax.broadcasted_iota(jnp.int32, (R, Gp), 1)
        key = jnp.where(col < n, key, jnp.uint32(0xFF800000))
    k2 = n // 2
    res = jnp.zeros((R, 1), jnp.uint32)
    T = (1 << D) - 1
    for p in range(32 // D - 1, -1, -1):
        shift = p * D
        best = res
        for j in range(1, T + 1):
            cand = res | jnp.uint32(j << shift)
            cnt = jnp.sum((key < cand).astype(jnp.int32), axis=-1,
                          keepdims=True)
            best = jnp.where(cnt <= k2, cand, best)
        res = best
    v2 = res

    def _from_key(kk):
        pos = (kk >> 31) == 1
        uu = jnp.where(pos, kk & jnp.uint32(0x7FFFFFFF), ~kk)
        return jax.lax.bitcast_convert_type(uu, jnp.float32)

    if n % 2 == 1:
        return _from_key(v2)
    cnt_lt = jnp.sum((key < v2).astype(jnp.int32), axis=-1, keepdims=True)
    # Mosaic has no unsigned max reduction: flip the sign bit for an
    # order-preserving int32 view, max there, flip back
    ikey = jax.lax.bitcast_convert_type(key ^ jnp.uint32(0x80000000),
                                        jnp.int32)
    mi = jnp.max(jnp.where(key < v2, ikey, jnp.int32(-2147483648)),
                 axis=-1, keepdims=True)
    m = (jax.lax.bitcast_convert_type(mi, jnp.uint32)
         ^ jnp.uint32(0x80000000))
    v1 = jnp.where(cnt_lt < k2, v2, m)
    return (_from_key(v1) + _from_key(v2)) * 0.5


def _residual_band_kernel(nf_ref, counts_ref, w_ref, b1min_ref, b1max_ref,
                          b2min_ref, b2max_ref, out_ref, xpad_ref,
                          smooth_ref=None, *,
                          n, n_tiles, D, mct, center_mean, bf16):
    """One row band, end to end.  counts_ref: [R, Gp] f32 (columns >= n
    zero); w_ref: [n_tiles, 384, 128] stacked smooth weights (see
    layout.stacked_blocks); b*_ref: [1, Gp] per-gene bounds (zero in
    padded columns); nf_ref: (1, 1) SMEM normalization factor; out_ref:
    [R, Gp] final residual; xpad_ref: [R, Gp + 256] scratch (one
    128-gene zero tile each side so every K=384 window is lane-aligned).

    When out_ref is narrower than f32 (f16/bf16 direct output — half the
    HBM write bytes, see residual_fused_pallas(out_dtype=...)), smooth_ref
    is an extra [R, Gp] f32 scratch: every intermediate stays f32 and only
    the final store rounds, bit-identical to casting the f32 result."""
    nf = nf_ref[0, 0]
    c = counts_ref[:, :]
    if c.dtype != jnp.float32:
        # u16/i32 raw counts stream at half the HBM/link bytes; the f32
        # conversion is exact (counts < 2^24).  Mosaic has no direct
        # 16-bit->f32 cast, so hop through int32.
        if c.dtype.itemsize == 2:
            c = c.astype(jnp.int32)
        c = c.astype(jnp.float32)
    R, Gp = c.shape
    cs = jnp.sum(c, axis=-1, keepdims=True)
    x = jnp.log2(c / cs * nf + 1.0)
    # stage-1 (log-space) bounds subtraction; padded columns carry zero
    # counts and zero bounds, so they stay exactly 0 through the clip
    bmin = b1min_ref[:, :]
    bmax = b1max_ref[:, :]
    y = jnp.where(x > bmax, x - bmax, 0.0)
    x = jnp.where(x < bmin, x - bmin, y)
    x = jnp.clip(x, -mct, mct)
    xpad_ref[:, 0:LANE] = jnp.zeros((R, LANE), jnp.float32)
    xpad_ref[:, LANE + Gp:] = jnp.zeros((R, LANE), jnp.float32)
    xpad_ref[:, LANE:LANE + Gp] = x
    # f16/bf16 out: the smooth result must stay f32 for the exact median,
    # so it lands in the dedicated scratch instead of out_ref
    tgt = out_ref if smooth_ref is None else smooth_ref
    # banded smooth: out tile j = xpad[:, j*128 : j*128+384] @ w[j]
    for j in range(n_tiles):
        xw = xpad_ref[:, j * LANE:j * LANE + 3 * LANE]
        if bf16:
            blk = jax.lax.dot_general(
                xw.astype(jnp.bfloat16), w_ref[j].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            blk = jax.lax.dot_general(
                xw, w_ref[j],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        tgt[:, j * LANE:(j + 1) * LANE] = blk
    y = tgt[:, :]
    if center_mean:
        col = jax.lax.broadcasted_iota(jnp.int32, (R, Gp), 1)
        med = (jnp.sum(jnp.where(col < n, y, 0.0), axis=-1, keepdims=True)
               / jnp.float32(n))
    else:
        med = radix_median_rows(y, n, D)
    r = y - med
    b2min = b2min_ref[:, :]
    b2max = b2max_ref[:, :]
    out = jnp.where(r > b2max, r - b2max, 0.0)
    out = jnp.where(r < b2min, r - b2min, out)
    out_ref[:, :] = jnp.exp2(out).astype(out_ref.dtype)


def _pick_tile_r(Gp: int, n_tiles: int) -> int:
    """Largest row band (multiple of 8, <= 128) fitting the VMEM budget:
    double-buffered counts + out, xpad scratch, the uint32 key temp, the
    resident [n_tiles, 384, 128] weight stack and the 4 bounds rows.
    Returns 0 when even 8 rows do not fit — the caller then keeps the
    unfused path."""
    w_bytes = n_tiles * 384 * 128 * 4 + 4 * Gp * 4
    per_row = Gp * 4 * (2 + 2 + 1 + 1 + 1)  # counts x2, out x2, xpad, key
    cap = max(0, _VMEM_BUDGET - w_bytes) // per_row
    tile = min(128, (cap // 8) * 8)
    return tile if tile >= 8 else 0


@functools.partial(jax.jit, static_argnames=(
    "n_tiles", "num_genes", "D", "mct", "center_mean", "matmul_dtype",
    "out_dtype", "interpret"))
def residual_fused_pallas(counts, w_stacked, b1min, b1max, b2min, b2max,
                          norm_factor, n_tiles: int, num_genes: int,
                          D: int = 1, mct: float = 3.0,
                          center_mean: bool = False,
                          matmul_dtype: str = "float32",
                          out_dtype: str = "float32",
                          interpret: bool = False):
    """counts [C, G] (raw, any float/int dtype) -> final residual [C, G].

    b1min/b1max: per-gene bounds of the K reference-group LOG means;
    b2min/b2max: bounds of the K reference-group residual-stage means
    (pass the group mean for both bounds to reproduce the
    ref_subtract_use_bounds=False config — the where-form is exactly
    x - mean when min == max).  Returns None-equivalent fallback marker by
    raising ValueError when the gene axis cannot fit VMEM (caller falls
    back to the unfused path).

    out_dtype='float16'/'bfloat16' makes the KERNEL store the rounded
    residual directly — half the HBM write bytes and no separate XLA cast
    pass; every intermediate (smooth, exact median) stays f32 in VMEM, so
    the result is bit-identical to the f32 output cast afterwards.  The
    product uses this when engine_transfer_dtype quantizes the download
    anyway (the 1M-cell memmap path)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if 32 % D:
        raise ValueError(f"median_radix_bits must divide 32, got {D}")
    counts = jnp.asarray(counts)
    if counts.dtype not in (jnp.float32, jnp.uint16, jnp.int16, jnp.int32,
                            jnp.uint32):
        counts = counts.astype(jnp.float32)
    C, G = counts.shape
    Gp = n_tiles * LANE
    odt = jnp.dtype(out_dtype)
    if odt not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.float16),
                   jnp.dtype(jnp.bfloat16)):
        raise ValueError(f"unsupported out_dtype {out_dtype}")
    tile_r = _pick_tile_r(Gp, n_tiles)
    # the narrow-out smooth scratch adds one f32 row unit but the
    # double-buffered out drops to half: net within _pick_tile_r's budget
    if tile_r == 0:
        raise ValueError("gene axis too wide for the fused residual kernel")
    if counts.dtype.itemsize == 2 or odt.itemsize == 2:
        # 16-bit VMEM tiling is (16, 128): keep the row band a multiple of 16
        tile_r = max(16, (tile_r // 16) * 16)
    padc = (-C) % tile_r
    cp = jnp.pad(counts, ((0, padc), (0, Gp - G))) \
        if (padc or Gp != G) else counts

    def _vec(v):
        v = jnp.asarray(v, jnp.float32).reshape(-1)[:G]
        return jnp.pad(v, (0, Gp - G))[None, :]

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    scratch = [pltpu.VMEM((tile_r, Gp + 2 * LANE), jnp.float32)]
    if odt != jnp.dtype(jnp.float32):
        scratch.append(pltpu.VMEM((tile_r, Gp), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_residual_band_kernel, n=num_genes,
                          n_tiles=n_tiles, D=D, mct=float(mct),
                          center_mean=center_mean,
                          bf16=(matmul_dtype == "bfloat16")),
        out_shape=jax.ShapeDtypeStruct((C + padc, Gp), odt),
        grid=((C + padc) // tile_r,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda r: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_r, Gp), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, 3 * LANE, LANE), lambda r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, Gp), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
        **kwargs,
    )(jnp.asarray(norm_factor, jnp.float32).reshape(1, 1), cp,
      jnp.asarray(w_stacked, jnp.float32), _vec(b1min), _vec(b1max),
      _vec(b2min), _vec(b2max))
    return out[:C, :G]
