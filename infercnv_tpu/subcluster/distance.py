"""Cell-cell distances and kNN on the MXU.

The reference computes pairwise euclidean distances with the multithreaded
C++ ``parallelDist`` (call sites: R/inferCNV_tumor_subclusters.R:191,411,
472,497,582,609; R/inferCNV_ops.R:1930) and kNN with RANN's C++ kd-tree
(``nn2``, R/inferCNV_tumor_subclusters.R:726).

TPU-native: ||a-b||^2 = |a|^2 + |b|^2 - 2 a.b — one [C, G] x [G, C] matmul
on the MXU plus rank-1 corrections; exact top-k via jax.lax.top_k on the
negated distances (brute force beats kd-trees on this hardware and is
exact).  ``knn_indices`` tiles the query rows in fixed-size blocks so only
a [block, C] slab of the Gram matrix is ever resident — 100k+ cells never
materialize the full [C, C] matrix (which would be 40 GB at 100k cells).
The full-matrix forms below are reserved for the host-side linkage paths,
which are themselves gated to small cell counts (subcluster/partition.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# query rows per kNN tile: the [block, C] distance slab at 100k cells is
# 2048 x 100k x 4 B = 0.8 GB, well inside one chip's HBM
_KNN_BLOCK = 2048
# below this cell count the single-shot [C, C] form is cheaper (one launch)
_KNN_ONESHOT_MAX = 16384


# below this row count the Gram trick runs in host BLAS: a [512, G] block
# is sub-100-Mflop work, while a device call pays a host->device->host
# round-trip per block — the heatmap orders hundreds of subcluster blocks,
# and over a remote-TPU tunnel those round-trips dominated the plot
_HOST_GRAM_MAX = 1024


@jax.jit
def _pairwise_sq_dists_dev(x):
    x = jnp.asarray(x, jnp.float32)
    sq = jnp.sum(x * x, axis=1)
    gram = x @ x.T
    d2 = sq[:, None] + sq[None, :] - 2.0 * gram
    return jnp.maximum(d2, 0.0)


def pairwise_sq_dists(x):
    """[C, C] squared euclidean distances of rows of x ([C, G]).
    Materializes the full matrix — intended for the small-C linkage paths
    only; use knn_indices for neighbor queries at scale.  Small host
    arrays compute in host float64 BLAS (no device round-trip, and closer
    to R's double-precision dist)."""
    if isinstance(x, np.ndarray) and x.shape[0] <= _HOST_GRAM_MAX:
        xh = np.asarray(x, np.float64)
        sq = np.einsum("ij,ij->i", xh, xh)
        d2 = sq[:, None] + sq[None, :] - 2.0 * (xh @ xh.T)
        return np.maximum(d2, 0.0)
    return _pairwise_sq_dists_dev(x)


def pairwise_dists(x) -> np.ndarray:
    """Euclidean distance matrix (host numpy, for linkage)."""
    return np.sqrt(np.asarray(pairwise_sq_dists(x), np.float64))


def condensed_dists(x) -> np.ndarray:
    """Condensed (scipy-style) distance vector for linkage."""
    d = pairwise_dists(x)
    iu = np.triu_indices(d.shape[0], k=1)
    return d[iu]


@functools.partial(jax.jit, static_argnames=("k",))
def _knn_oneshot(x, k: int):
    d2 = pairwise_sq_dists(x)
    _neg, idx = jax.lax.top_k(-d2, k)
    return idx


@functools.partial(jax.jit, static_argnames=("k",))
def _knn_block_vs_all(xq, x, sq_all, k: int):
    """Exact top-k for a [B, G] query block against all [C, G] rows."""
    xq = jnp.asarray(xq, jnp.float32)
    sq_q = jnp.sum(xq * xq, axis=1)
    d2 = sq_q[:, None] + sq_all[None, :] - 2.0 * (xq @ x.T)
    _neg, idx = jax.lax.top_k(-jnp.maximum(d2, 0.0), k)
    return idx


def knn_indices(x, k: int):
    """Exact k nearest neighbors (self included, as RANN::nn2 returns the
    query point itself as neighbor 1).  Returns int32 [C, k].

    Tiled: queries stream through in _KNN_BLOCK-row blocks against the full
    [C, G] matrix resident on device, so peak memory is O(block * C), never
    O(C^2)."""
    x = np.asarray(x, np.float32)
    C = x.shape[0]
    if C <= _KNN_ONESHOT_MAX:
        return _knn_oneshot(jnp.asarray(x), k)
    xd = jnp.asarray(x)
    sq_all = jnp.sum(xd * xd, axis=1)
    out = np.empty((C, k), np.int32)
    B = _KNN_BLOCK
    for b in range(0, C, B):
        blk = xd[b:b + B]
        if blk.shape[0] < B:  # pad the ragged tail to keep one compiled shape
            blk = jnp.pad(blk, ((0, B - blk.shape[0]), (0, 0)))
        idx = _knn_block_vs_all(blk, xd, sq_all, k)
        out[b:b + B] = np.asarray(idx)[: min(B, C - b)]
    return out
