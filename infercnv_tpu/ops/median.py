"""Exact row-median via bit-space radix select.

``jnp.median`` lowers to a full per-row sort (~68 ms per 8k x 8.5k chunk on
v5e); the median only needs two order statistics.  Mapping float32 to its
order-preserving uint32 key and binary-searching the 32 bit positions finds
the k-th statistic in 32 compare+popcount passes that XLA fuses tightly —
numerically identical to numpy/R medians (exact float equality, no
interpolation error).
"""

from __future__ import annotations

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


def row_median(v) -> jax.Array:
    """Exact median along the last axis of a float32 array [..., n].
    Matches numpy.median (mean of the two middle values for even n)."""
    v = jnp.asarray(v, jnp.float32)
    n = v.shape[-1]
    key = _to_key(v)
    k2 = n // 2  # 0-based upper-middle order statistic
    res = jnp.zeros(v.shape[:-1] + (1,), jnp.uint32)
    for bit in range(31, -1, -1):
        cand = res | jnp.uint32(1 << bit)
        cnt = jnp.sum((key < cand).astype(jnp.int32), axis=-1, keepdims=True)
        res = jnp.where(cnt <= k2, cand, res)
    v2 = res
    if n % 2 == 1:
        return _from_key(v2)[..., 0]
    cnt_lt = jnp.sum((key < v2).astype(jnp.int32), axis=-1, keepdims=True)
    m = jnp.max(jnp.where(key < v2, key, jnp.uint32(0)), axis=-1, keepdims=True)
    v1 = jnp.where(cnt_lt < k2, v2, m)
    return ((_from_key(v1) + _from_key(v2)) * 0.5)[..., 0]
