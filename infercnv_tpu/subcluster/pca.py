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

    on_device = isinstance(x_cg, jnp.ndarray) and not isinstance(x_cg, np.ndarray)
    x = x_cg if on_device else np.asarray(x_cg)
    C, G = x.shape
    if G <= n_features:
        return np.arange(G)
    if on_device:
        # device-resident rows (the step-15 Leiden fast path): every
        # statistic reduces to per-GENE vectors, so compute them ON the
        # device and download kilobytes — the previous host-chunked loop
        # pulled the whole [C, G] matrix back through the link (measured
        # as 2/3 of the entire subclustering step at 50k cells)
        mu_d, var_d = _gene_moments(x)
        mu = np.asarray(mu_d, np.float64)
        var = np.asarray(var_d, np.float64)
    else:
        mu = x.mean(axis=0, dtype=np.float64)
        var = x.var(axis=0, ddof=1, dtype=np.float64)
    ok = var > 0
    if ok.sum() < 10:
        return np.arange(G)
    spline = fit_smoothing_spline(np.log10(mu[ok] + 1e-12), np.log10(var[ok]))
    exp_sd = np.sqrt(10.0 ** spline.predict(np.log10(np.maximum(mu, 1e-12))))
    exp_sd = np.maximum(exp_sd, 1e-12)
    clip = np.sqrt(C)
    if on_device:
        zsum_d, zsq_d = _clipped_z_moments(
            x, jnp.asarray(mu, jnp.float32), jnp.asarray(1.0 / exp_sd,
                                                         jnp.float32),
            float(clip))
        zsum = np.asarray(zsum_d, np.float64)
        zsq = np.asarray(zsq_d, np.float64)
    else:
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


@jax.jit
def _gene_moments(x):
    """Per-gene mean and ddof-1 variance of a device [C, G] matrix (f32)."""
    x = jnp.asarray(x, jnp.float32)
    C = x.shape[0]
    mu = jnp.mean(x, axis=0)
    var = jnp.sum((x - mu[None, :]) ** 2, axis=0) / jnp.float32(C - 1)
    return mu, var


@jax.jit
def _clipped_z_moments(x, mu, inv_sd, clip):
    """sum and sum-of-squares per gene of min((x - mu) * inv_sd, clip)."""
    zb = jnp.minimum((jnp.asarray(x, jnp.float32) - mu[None, :])
                     * inv_sd[None, :], clip)
    return jnp.sum(zb, axis=0), jnp.sum(zb * zb, axis=0)


def pca_embed(x_cg: np.ndarray, n_components: int = 10, scale_max: float = 10.0,
              seed: int = 0, use_variable_features: bool = True,
              n_features: int = 2000, upload_dtype=None) -> np.ndarray:
    """upload_dtype: ship host rows to the device in this dtype (e.g.
    float16 when the matrix already carries f16-quantized values from
    engine_transfer_dtype — the cast is then LOSSLESS and the upload
    halves; at 1M cells the per-group [n, 2000] upload is the dominant
    subclustering cost on a remote link)."""
    if use_variable_features and x_cg.shape[1] > n_features:
        x_cg = x_cg[:, variable_features_vst(x_cg, n_features)]
    n_components = min(n_components, min(x_cg.shape) - 1)
    if n_components < 1:
        return np.zeros((x_cg.shape[0], 1), np.float32)
    if upload_dtype is not None and isinstance(x_cg, np.ndarray):
        x_cg = jnp.asarray(np.ascontiguousarray(x_cg, dtype=upload_dtype))
    emb = _scale_and_project(x_cg, jax.random.PRNGKey(seed), n_components, scale_max)
    return np.asarray(emb)
