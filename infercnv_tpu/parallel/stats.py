"""Distributed statistics over the cell-sharded mesh.

The reference computes every global statistic in shared memory (single R
process).  Cell-sharded equivalents (SURVEY §5/§7: "psum-stats, distributed
quantile/histogram"):

* group-wise per-gene means/sds — shard-local one-hot contractions reduced
  with psum over the cell axis,
* exact global medians/quantiles — the bit-space radix select of
  ops/median.py generalized to sharded vectors: 32 rounds of shard-local
  counts + psum, no gather of the data.

All functions run under shard_map over a ``Mesh(("cells",))`` and are
bitwise-identical to their single-device counterparts.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map

from infercnv_tpu.ops.median import _from_key, _to_key


def _group_stats_local(x, onehot):
    """Shard-local pieces reduced over the mesh: returns per-gene group
    (mean, sd) with ddof=1, matching R colwise stats."""
    counts = jax.lax.psum(jnp.sum(onehot, axis=1), "cells")          # [K]
    sums = jax.lax.psum(onehot @ x, "cells")                         # [K, G]
    sqs = jax.lax.psum(onehot @ (x * x), "cells")                    # [K, G]
    mean = sums / counts[:, None]
    var = (sqs - counts[:, None] * mean * mean) / jnp.maximum(counts[:, None] - 1, 1)
    return mean, jnp.sqrt(jnp.maximum(var, 0.0))


@functools.lru_cache(maxsize=8)
def _group_stats_fn(mesh: Mesh):
    return jax.jit(_shard_map(
        _group_stats_local, mesh=mesh,
        in_specs=(P("cells", None), P(None, "cells")),
        out_specs=(P(None, None), P(None, None)),
    ))


def sharded_group_gene_stats(x, onehot, mesh: Mesh):
    """x: [C, G] sharded on cells; onehot: [K, C] sharded on its cell axis.
    Returns replicated (means [K, G], sds [K, G]).  The compiled program is
    cached per mesh (a fresh jit wrapper per call would retrace+recompile
    every invocation)."""
    return _group_stats_fn(mesh)(x, onehot)


def _kth_key_local(keys, k):
    """Radix-select the k-th (0-based) smallest uint32 key of a sharded
    vector via psum'd counts."""
    res = jnp.zeros((), jnp.uint32)
    for bit in range(31, -1, -1):
        cand = res | jnp.uint32(1 << bit)
        cnt = jax.lax.psum(jnp.sum((keys < cand).astype(jnp.int32)), "cells")
        res = jnp.where(cnt <= k, cand, res)
    return res


def _median_local(values):
    n = jax.lax.psum(jnp.asarray(values.shape[0], jnp.int32), "cells")
    keys = _to_key(jnp.asarray(values, jnp.float32))
    k2 = n // 2
    v2 = _kth_key_local(keys, k2)
    odd = (n % 2) == 1
    cnt_lt = jax.lax.psum(jnp.sum((keys < v2).astype(jnp.int32)), "cells")
    below = jnp.where(keys < v2, keys, jnp.uint32(0))
    m = jax.lax.pmax(jnp.max(below, initial=jnp.uint32(0)), "cells")
    v1 = jnp.where(cnt_lt < k2, v2, m)
    med_even = (_from_key(v1[None])[0] + _from_key(v2[None])[0]) * 0.5
    return jnp.where(odd, _from_key(v2[None])[0], med_even)


@functools.lru_cache(maxsize=8)
def _median_fn(mesh: Mesh):
    return jax.jit(_shard_map(_median_local, mesh=mesh,
                              in_specs=(P("cells"),), out_specs=P()))


def sharded_median(values, mesh: Mesh):
    """Exact global median of a cells-sharded vector (e.g. per-cell library
    sizes for the depth-norm factor) without gathering the data.  Compiled
    once per mesh."""
    return _median_fn(mesh)(values)


def _quantile_local(values, lo_idx: int, hi_idx: int, frac: float):
    """Type-7 (R default) quantile via two radix selects + interpolation.
    The order-statistic indices and the interpolation fraction are HOST
    float64 constants — computing h=(n-1)*q in on-device float32 quantizes
    frac to ~0.06 at n=1e6, breaking np.quantile parity."""
    keys = _to_key(jnp.asarray(values, jnp.float32))
    v_lo = _kth_key_local(keys, lo_idx)
    v_hi = _kth_key_local(keys, hi_idx)
    lo = _from_key(v_lo[None])[0]
    hi = _from_key(v_hi[None])[0]
    return lo + jnp.float32(frac) * (hi - lo)


@functools.lru_cache(maxsize=32)
def _quantile_fn(mesh: Mesh, lo_idx: int, hi_idx: int, frac: float):
    return jax.jit(_shard_map(
        functools.partial(_quantile_local, lo_idx=lo_idx, hi_idx=hi_idx,
                          frac=frac),
        mesh=mesh, in_specs=(P("cells"),), out_specs=P()))


def sharded_quantile(values, q: float, mesh: Mesh):
    """Exact global quantile (R type-7 interpolation, matching np.quantile)
    of a cells-sharded vector — used for the heatmap x.range bounds.
    Compiled once per (mesh, order-statistic) pair."""
    n = int(np.prod(values.shape))
    h = (n - 1) * float(q)            # float64 on host
    lo_idx = int(np.floor(h))
    frac = float(h - lo_idx)
    hi_idx = min(lo_idx + 1, n - 1)
    return _quantile_fn(mesh, lo_idx, hi_idx, frac)(values)


def put_cell_sharded(x, mesh: Mesh):
    """Place a [C, ...] array with the cell axis sharded over the mesh.

    Works across PROCESS boundaries too: when the mesh spans devices this
    process cannot address (a jax.distributed multi-host run), the global
    array is assembled shard-by-shard from the host copy every process
    holds (make_array_from_callback); single-process meshes keep the
    direct device_put."""
    spec = P("cells", *([None] * (np.ndim(x) - 1)))
    sharding = NamedSharding(mesh, spec)
    if any(d.process_index != jax.process_index()
           for d in mesh.devices.flat):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])
    return jax.device_put(jnp.asarray(x), sharding)


def to_host(r) -> np.ndarray:
    """Materialize a device result on the host, multi-process-safely.

    Single-process (fully addressable) arrays take the plain np.asarray
    path (bitwise-identical behavior to round 4).  Under jax.distributed,
    replicated results read the local copy and cell-sharded results are
    allgathered across processes (gloo on CPU, ICI/DCN on TPU pods) so
    every host sees the full matrix — the pipeline's host-side steps then
    run identically on all hosts."""
    if getattr(r, "is_fully_addressable", True):
        return np.asarray(r)
    if r.is_fully_replicated:
        return np.asarray(r.addressable_shards[0].data)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(r, tiled=True))
