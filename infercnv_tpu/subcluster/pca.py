"""PCA embedding for the leiden_method='PCA' route.

reference: .leiden_seurat_preprocess_routine
(R/inferCNV_tumor_subclusters.R:699-723) — Seurat ScaleData (per-gene
z-score, clipped at 10) followed by RunPCA(npcs=10) on all genes.

TPU-native: the scaled [C, G] matrix's top principal components come from
an SVD of the (cells x genes) matrix on device; for large C this is a
randomized range-finder (two matmuls on the MXU) + small host SVD.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_components", "scale_max"))
def _scale_and_project(x, key, n_components: int, scale_max: float):
    x = jnp.asarray(x, jnp.float32)
    mu = jnp.mean(x, axis=0, keepdims=True)
    sd = jnp.std(x, axis=0, ddof=1, keepdims=True)
    z = (x - mu) / jnp.where(sd == 0, 1.0, sd)
    z = jnp.minimum(z, scale_max)  # Seurat clips scaled values at scale.max=10
    C, G = z.shape
    k = min(n_components + 8, min(C, G))
    # randomized range finder: Y = Z (Z^T Omega), one power iteration
    omega = jax.random.normal(key, (G, k), jnp.float32)
    Y = z @ omega
    Y = z @ (z.T @ Y)
    Q, _ = jnp.linalg.qr(Y)
    B = Q.T @ z                       # [k, G]
    _, s, Vt = jnp.linalg.svd(B, full_matrices=False)
    emb = z @ Vt[:n_components].T     # [C, n_components]
    return emb


def pca_embed(x_cg: np.ndarray, n_components: int = 10, scale_max: float = 10.0,
              seed: int = 0) -> np.ndarray:
    n_components = min(n_components, min(x_cg.shape) - 1)
    if n_components < 1:
        return np.zeros((x_cg.shape[0], 1), np.float32)
    emb = _scale_and_project(x_cg, jax.random.PRNGKey(seed), n_components, scale_max)
    return np.asarray(emb)
