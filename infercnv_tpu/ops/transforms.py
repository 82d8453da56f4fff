"""Elementwise / reduction matrix ops of the pipeline (layer L1).

Each op cites the reference implementation it reproduces.  All ops take and
return ``[C, G]`` arrays (cells-major) and are pure jnp functions usable
under jit / shard_map; group statistics are expressed as one-hot matmuls so
they lower to MXU ops and psum cleanly under a cell-sharded mesh.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def group_onehot(groups: Sequence[np.ndarray], num_cells: int) -> np.ndarray:
    """[n_groups, C] 0/1 membership matrix (host-precomputed, static)."""
    M = np.zeros((len(groups), num_cells), np.float32)
    for i, idx in enumerate(groups):
        M[i, np.asarray(idx)] = 1.0
    return M


# ---------------------------------------------------------------------------
# normalization / transforms
# ---------------------------------------------------------------------------

def normalize_counts_by_seq_depth(x, normalize_factor: Optional[float] = None):
    """Per-cell total-count scaling (reference R/inferCNV_ops.R:3064-3111):
    counts / colSums * median(colSums) (or a given factor).

    Host numpy on host arrays: this touches the FULL counts matrix once, and
    shipping 100k x 9k cells over a remote-TPU link for a row sum costs
    minutes; the memory-bound host pass costs seconds.  (The engine fast
    path re-derives the same normalization on device per chunk.)"""
    if isinstance(x, jnp.ndarray) and not isinstance(x, np.ndarray):
        cs = jnp.sum(x, axis=1, keepdims=True)
        if normalize_factor is None:
            factor = jnp.median(cs[:, 0])
        else:
            factor = jnp.float32(normalize_factor)
        return x / cs * factor
    x = np.asarray(x, np.float32)
    cs = x.sum(axis=1, keepdims=True)
    factor = (np.float32(np.median(cs[:, 0])) if normalize_factor is None
              else np.float32(normalize_factor))
    return x / cs * factor


def log2xplus1(x):
    """log2(x + 1) (reference :2756-2769)."""
    return jnp.log2(jnp.asarray(x, jnp.float32) + 1.0)


def invert_log2xplus1(x):
    """2^x - 1 (reference :2786-2798)."""
    return jnp.exp2(jnp.asarray(x, jnp.float32)) - 1.0


def invert_log2(x):
    """2^x (reference :2814-2826)."""
    return jnp.exp2(jnp.asarray(x, jnp.float32))


def anscombe_transform(x):
    """2*sqrt(x + 3/8) (reference :3130-3141)."""
    return 2.0 * jnp.sqrt(jnp.asarray(x, jnp.float32) + 3.0 / 8.0)


def add_pseudocount(x, pseudocount: float = 1.0):
    """x + pseudocount (reference add_pseudocount :3146-3158)."""
    return jnp.asarray(x, jnp.float32) + pseudocount


def make_zero_NA(x):
    """Zeros -> NaN (reference make_zero_NA :2837-2860)."""
    x = jnp.asarray(x, jnp.float32)
    return jnp.where(x == 0, jnp.nan, x)


def normalize_by_upper_quartile(x):
    """Cross-cell upper-quartile normalization (reference
    upper_quartile_norm :3193-3212): each cell scaled by its 75th
    percentile, rescaled by the mean upper quartile."""
    x = jnp.asarray(x, jnp.float32)
    uq = jnp.quantile(x, 0.75, axis=1, keepdims=True)
    uq = jnp.where(uq == 0, 1.0, uq)
    return x / uq * jnp.mean(uq)


# ---------------------------------------------------------------------------
# gene filters
# ---------------------------------------------------------------------------

def below_min_mean_expr_cutoff(x, min_mean_expr: float) -> np.ndarray:
    """Indices of genes whose mean across all cells < cutoff
    (reference .below_min_mean_expr_cutoff :2154-2163)."""
    means = np.asarray(x, np.float32).mean(axis=0)  # host: one pass, no
    # full-matrix device transfer (R computes in double; f32 pairwise sums
    # agree to ~1e-5 relative, far from the integer-count cutoff scale)
    return np.nonzero(means < min_mean_expr)[0]


def genes_below_min_cells_ref(x, min_cells_per_gene: int) -> np.ndarray:
    """Indices of genes expressed (>0) in fewer than `min_cells_per_gene`
    cells (reference require_above_min_cells_ref :2182-2213)."""
    x = np.asarray(x)
    # host, chunked: the bool temp for 100k x 9k at once thrashes cache
    n_expressed = np.zeros(x.shape[1], np.int64)
    for b in range(0, x.shape[0], 8192):
        n_expressed += np.count_nonzero(x[b:b + 8192] > 0, axis=0)
    return np.nonzero(n_expressed < min_cells_per_gene)[0]


# ---------------------------------------------------------------------------
# reference subtraction
# ---------------------------------------------------------------------------

def ref_group_gene_means(x, ref_onehot, inv_log: bool = False):
    """[n_ref_groups, G] per-gene means over each reference group
    (reference .get_normal_gene_mean_bounds :1708-1735).  With inv_log, the
    mean is taken in count space: log2(mean(2^x - 1) + 1)."""
    x = jnp.asarray(x, jnp.float32)
    M = jnp.asarray(ref_onehot, jnp.float32)
    counts = jnp.sum(M, axis=1, keepdims=True)
    if inv_log:
        vals = jnp.exp2(x) - 1.0
        means = (M @ vals) / counts
        return jnp.log2(means + 1.0)
    return (M @ x) / counts


def subtract_ref_expr(x, grp_means, use_bounds: bool = True):
    """Subtract the reference expression profile per gene
    (reference subtract_ref_expr_from_obs :1678-1702, .subtract_expr :1742-1786).

    use_bounds=True: values within [min, max] of the per-group means go to 0;
    values outside subtract the nearest bound.  Otherwise subtract the mean
    of the group means.
    """
    x = jnp.asarray(x, jnp.float32)
    grp_means = jnp.asarray(grp_means, jnp.float32)  # [n_groups, G]
    if use_bounds:
        gmin = jnp.min(grp_means, axis=0)  # [G]
        gmax = jnp.max(grp_means, axis=0)
        out = jnp.where(x > gmax, x - gmax, 0.0)
        out = jnp.where(x < gmin, x - gmin, out)
        return out
    return x - jnp.mean(grp_means, axis=0)


# ---------------------------------------------------------------------------
# clamping / centering / outliers
# ---------------------------------------------------------------------------

def apply_max_threshold_bounds(x, threshold: float):
    """Clamp to ±threshold (reference :2970-2983)."""
    return jnp.clip(jnp.asarray(x, jnp.float32), -threshold, threshold)


def center_cells(x, method: str = "median"):
    """Per-cell (row, in our layout) centering by median or mean
    (reference center_cell_expr_across_chromosome :2074-2088, .center_columns
    :2094-2109)."""
    x = jnp.asarray(x, jnp.float32)
    if method == "median":
        ctr = jnp.median(x, axis=1, keepdims=True)
    else:
        ctr = jnp.mean(x, axis=1, keepdims=True)
    return x - ctr


def get_average_bounds(x) -> Tuple[jax.Array, jax.Array]:
    """(mean of per-cell minima, mean of per-cell maxima)
    (reference .get_average_bounds :2734-2742 — quantile()[1]/[5] are min/max)."""
    x = jnp.asarray(x, jnp.float32)
    return jnp.mean(jnp.min(x, axis=1)), jnp.mean(jnp.max(x, axis=1))


def remove_outliers_norm(x, out_method: str = "average_bound",
                         lower_bound: Optional[float] = None,
                         upper_bound: Optional[float] = None):
    """Clamp outliers (reference remove_outliers_norm :1969-2054)."""
    x = jnp.asarray(x, jnp.float32)
    if lower_bound is not None and upper_bound is not None:
        lo, hi = lower_bound, upper_bound
    elif out_method == "average_bound":
        lo, hi = get_average_bounds(x)
    else:
        raise ValueError("must specify out_method='average_bound' or both bounds")
    return jnp.clip(x, lo, hi)


# ---------------------------------------------------------------------------
# denoising
# ---------------------------------------------------------------------------

def clear_noise(x, threshold: float, center_pos: float = 0.0):
    """Values strictly inside (center-threshold, center+threshold) -> center
    (reference .clear_noise :2302-2346 helper at :2232-2278).  Host numpy
    inputs stay on host (a full-matrix device round-trip costs minutes at
    1M cells over a remote link)."""
    if isinstance(x, np.ndarray):
        x = np.asarray(x, np.float32)
        if threshold == 0:
            return x
        inside = (x > center_pos - threshold) & (x < center_pos + threshold)
        return np.where(inside, np.float32(center_pos), x)
    x = jnp.asarray(x, jnp.float32)
    if threshold == 0:
        return x
    inside = (x > center_pos - threshold) & (x < center_pos + threshold)
    return jnp.where(inside, center_pos, x)


def ref_mean_sd_bounds(x, ref_idx: np.ndarray, sd_amplifier: float = 1.5):
    """(mean_ref, mean of per-ref-cell sd * amplifier)
    (reference clear_noise_via_ref_mean_sd :2302-2346; sd is the per-cell
    sample sd across genes, ddof=1).  Host numpy on host arrays — only the
    reference rows are touched."""
    if isinstance(x, jnp.ndarray) and not isinstance(x, np.ndarray):
        vals = x[jnp.asarray(ref_idx)]
        mean_ref = jnp.mean(vals)
        G = vals.shape[1]
        percell_sd = (jnp.std(vals, axis=1, ddof=1) if G > 1
                      else jnp.zeros(vals.shape[0]))
        return mean_ref, jnp.mean(percell_sd) * sd_amplifier
    vals = np.asarray(x, np.float32)[np.asarray(ref_idx)]
    mean_ref = np.float32(vals.mean())
    G = vals.shape[1]
    percell_sd = (vals.std(axis=1, ddof=1) if G > 1
                  else np.zeros(vals.shape[0], np.float32))
    return mean_ref, np.float32(percell_sd.mean() * sd_amplifier)


def clear_noise_via_ref_mean_sd(x, ref_idx: np.ndarray, sd_amplifier: float = 1.5,
                                inplace: bool = False):
    """inplace=True updates the host matrix block-by-block with no
    full-size temporaries — the 1M-cell path (a 34 GB residual would
    otherwise spawn two same-sized temporaries); the caller must own the
    buffer (run() does: the engine allocated it)."""
    mean_ref, spread = ref_mean_sd_bounds(x, ref_idx, sd_amplifier)
    if isinstance(x, jnp.ndarray) and not isinstance(x, np.ndarray):
        inside = (x > mean_ref - spread) & (x < mean_ref + spread)
        return jnp.where(inside, mean_ref, x)
    # host path: elementwise over the full matrix — never ship it to the
    # device for a compare+select (minutes over a remote-TPU link at 100k)
    x = np.asarray(x, np.float32)
    lo, hi = mean_ref - spread, mean_ref + spread
    if inplace:
        for b in range(0, x.shape[0], 16384):
            blk = x[b:b + 16384]
            blk[(blk > lo) & (blk < hi)] = np.float32(mean_ref)
        return x
    inside = (x > lo) & (x < hi)
    return np.where(inside, np.float32(mean_ref), x)


def depress_log_signal_midpt_val(x, center: float, delta_midpt: float, slope: float = 20.0):
    """Logistic soft noise shrink (reference inferCNV_heatmap.R:2783-2810,
    .logistic in SplatterScrape.R:210): each value is pulled toward `center`
    by p = logistic(|x - center|; midpoint=delta_midpt, slope), so values
    near the center shrink to it and values far beyond the midpoint are
    kept.  Host numpy inputs stay on host (see clear_noise)."""
    if isinstance(x, np.ndarray):
        x = np.asarray(x, np.float32)
        delta = np.abs(x - center)
        p = 1.0 / (1.0 + np.exp(-slope * (delta - delta_midpt)))
        return (center + np.sign(x - center) * delta * p).astype(np.float32)
    x = jnp.asarray(x, jnp.float32)
    delta = jnp.abs(x - center)
    p = 1.0 / (1.0 + jnp.exp(-slope * (delta - delta_midpt)))
    return center + jnp.sign(x - center) * delta * p


# ---------------------------------------------------------------------------
# z-scoring / scaling
# ---------------------------------------------------------------------------

def scale_infercnv_expr(x):
    """Per-gene z-score across cells (reference scale_infercnv_expr
    :3174-3185; R scale() uses ddof=1)."""
    x = jnp.asarray(x, jnp.float32)
    mu = jnp.mean(x, axis=0, keepdims=True)
    sd = jnp.std(x, axis=0, ddof=1, keepdims=True)
    return (x - mu) / jnp.where(sd == 0, 1.0, sd)


def transform_to_reference_based_zscores(x, ref_idx: np.ndarray):
    """Ref-based z-scores with Poisson floor sd >= sqrt(mean)
    (reference transform_to_reference_based_Zscores :2874-2907)."""
    x = jnp.asarray(x, jnp.float32)
    ref = x[jnp.asarray(ref_idx)]
    mu = jnp.mean(ref, axis=0)
    sd = jnp.std(ref, axis=0, ddof=1)
    sd = jnp.maximum(sd, jnp.sqrt(jnp.maximum(mu, 0.0)))
    sd = jnp.where(sd == 0, 1.0, sd)
    return (x - mu) / sd


def mean_center_gene_expr(x):
    """Per-gene mean centering (reference mean_center_gene_expr :2940-2952)."""
    x = jnp.asarray(x, jnp.float32)
    return x - jnp.mean(x, axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# chromosome-end trimming
# ---------------------------------------------------------------------------

def remove_tails_indices(chr_indices: np.ndarray, tail_length: int) -> np.ndarray:
    """Gene indices to drop at both ends of one chromosome
    (reference .remove_tails R/inferCNV_ops.R:2370-2386)."""
    chr_indices = np.asarray(chr_indices)
    n = chr_indices.shape[0]
    if tail_length < 3 or n < 3:
        return np.zeros((0,), np.int64)
    if n < tail_length * 2:
        tail_length = n // 3
    return np.concatenate([chr_indices[:tail_length], chr_indices[n - tail_length:]])


def genes_at_chr_ends(gene_order, window_length: int) -> np.ndarray:
    """All gene indices within (w-1)/2 of chromosome ends
    (reference remove_genes_at_ends_of_chromosomes :3000-3044)."""
    tail = (window_length - 1) // 2
    out: List[np.ndarray] = []
    for (b, e) in gene_order.chr_ranges():
        out.append(remove_tails_indices(np.arange(b, e), tail))
    return np.concatenate(out) if out else np.zeros((0,), np.int64)
