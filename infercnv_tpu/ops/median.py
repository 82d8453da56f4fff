"""Exact row-median via bit-space radix select.

``jnp.median`` lowers to a full per-row sort (~68 ms per 8k x 8.5k chunk on
v5e); the median only needs two order statistics.  Mapping float32 to its
order-preserving uint32 key and radix-searching the 32 bits finds the k-th
statistic exactly — numerically identical to numpy/R medians (exact float
equality, no interpolation error).

The search digit size trades HBM passes for VPU compares: 1 bit/pass = 32
data reads (15.0 ms on the 8k x 8.5k chunk), 2 bits/pass = 16 reads with 3
fused compare+reduce each (9.0 ms), 4 bits/pass = 8 reads x 15 compares
(10.5 ms, compute-bound).  2 bits/pass is the measured optimum on v5e.
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
