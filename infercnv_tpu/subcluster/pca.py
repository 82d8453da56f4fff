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


def variable_features_vst(x_cg: np.ndarray, n_features: int = 2000) -> np.ndarray:
    """Seurat FindVariableFeatures(selection.method='vst') analogue
    (the reference calls it before RunPCA,
    R/inferCNV_tumor_subclusters.R:702-709): fit a smooth trend of
    log10(variance) ~ log10(mean), standardize values with the expected sd
    clipped at sqrt(N), rank genes by standardized variance.

    Returns indices of the top `n_features` genes."""
    from infercnv_tpu.utils.splines import fit_smoothing_spline

    x = np.asarray(x_cg)
    C, G = x.shape
    if G <= n_features:
        return np.arange(G)
    mu = x.mean(axis=0, dtype=np.float64)
    var = x.var(axis=0, ddof=1, dtype=np.float64)
    ok = var > 0
    if ok.sum() < 10:
        return np.arange(G)
    spline = fit_smoothing_spline(np.log10(mu[ok] + 1e-12), np.log10(var[ok]))
    exp_sd = np.sqrt(10.0 ** spline.predict(np.log10(np.maximum(mu, 1e-12))))
    exp_sd = np.maximum(exp_sd, 1e-12)
    clip = np.sqrt(C)
    # running moments of the clipped z, accumulated over ROW CHUNKS — a
    # full-size standardized copy here was several [C, G] float64
    # temporaries (tens of GB at 100k cells)
    zsum = np.zeros(G)
    zsq = np.zeros(G)
    inv_sd = (1.0 / exp_sd)[None, :]
    for b in range(0, C, 4096):
        zb = np.minimum((x[b:b + 4096] - mu[None, :]) * inv_sd, clip)
        zsum += zb.sum(axis=0, dtype=np.float64)
        zsq += np.einsum("ij,ij->j", zb, zb)
    zmean = zsum / C
    std_var = (zsq - C * zmean * zmean) / (C - 1)
    std_var[~ok] = 0.0
    return np.sort(np.argsort(-std_var, kind="stable")[:n_features])


def pca_embed(x_cg: np.ndarray, n_components: int = 10, scale_max: float = 10.0,
              seed: int = 0, use_variable_features: bool = True,
              n_features: int = 2000) -> np.ndarray:
    if use_variable_features and x_cg.shape[1] > n_features:
        x_cg = x_cg[:, variable_features_vst(x_cg, n_features)]
    n_components = min(n_components, min(x_cg.shape) - 1)
    if n_components < 1:
        return np.zeros((x_cg.shape[0], 1), np.float32)
    emb = _scale_and_project(x_cg, jax.random.PRNGKey(seed), n_components, scale_max)
    return np.asarray(emb)
