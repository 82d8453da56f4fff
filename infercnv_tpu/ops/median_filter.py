"""2-D median filtering within (subcluster x chromosome) blocks.

reference: R/noise_reduction.R apply_median_filtering (:43-89) and
.median_filter (:92-113).  The reference's neighborhood is the rectangle
[pos - (half+1), pos + (half+1)] clamped with its particular edge rule:
positions within half+1 of an edge extend to the edge.  Reproduced exactly,
vectorized over stacked shifted copies with NaN padding and nanmedian.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from infercnv_tpu.core.object import InferCNV


def _median_filter_block(data: np.ndarray, window_size: int,
                         max_plane_elems: int = 20_000_000) -> np.ndarray:
    """data: [G_chr, n_cells] (genes x cells, reference orientation).

    The (2r+1)^2 shifted planes are built over CELL-AXIS CHUNKS with an
    r-wide halo, so peak memory is O(W^2 * G_chr * chunk) instead of
    O(W^2 * G_chr * n_cells) — at window 7 the unchunked stack is 81 full
    float64 copies of the block (~65 GB for a 50k-cell group)."""
    half = (window_size - 1) // 2
    r = half + 1
    xdim, ydim = data.shape
    W = 2 * r + 1
    chunk = max(W, max_plane_elems // max(W * W * xdim, 1))
    if ydim > chunk:
        out = np.empty_like(data, dtype=np.float64)
        for c0 in range(0, ydim, chunk):
            c1 = min(c0 + chunk, ydim)
            # the reference edge rule is exactly "clamp [pos-r, pos+r] to
            # the array", so an r-wide halo slab reproduces the full
            # computation for its kept columns: interior kept positions
            # never touch the slab edge, and slabs at the true edges clamp
            # identically to the global rule
            h0 = max(0, c0 - r)
            h1 = min(ydim, c1 + r)
            sub = _median_filter_block_core(data[:, h0:h1], window_size)
            out[:, c0:c1] = sub[:, c0 - h0:c1 - h0]
        return out
    return _median_filter_block_core(data, window_size)


def _median_filter_block_core(data: np.ndarray, window_size: int) -> np.ndarray:
    half = (window_size - 1) // 2
    r = half + 1
    xdim, ydim = data.shape
    # reference edge rule: posa = 1 if pos <= r else pos - r;
    #                      posb = dim if pos >= dim - r else pos + r
    xa = np.where(np.arange(1, xdim + 1) <= r, 0, np.arange(xdim) - r)
    xb = np.where(np.arange(1, xdim + 1) >= xdim - r, xdim - 1, np.arange(xdim) + r)
    ya = np.where(np.arange(1, ydim + 1) <= r, 0, np.arange(ydim) - r)
    yb = np.where(np.arange(1, ydim + 1) >= ydim - r, ydim - 1, np.arange(ydim) + r)
    W = 2 * r + 1
    stack = np.full((W * W, xdim, ydim), np.nan)
    for i, dx in enumerate(range(-r, r + 1)):
        sx_lo = max(0, -dx)
        sx_hi = min(xdim, xdim - dx)
        for j, dy in enumerate(range(-r, r + 1)):
            sy_lo = max(0, -dy)
            sy_hi = min(ydim, ydim - dy)
            if sx_lo >= sx_hi or sy_lo >= sy_hi:
                continue  # offset falls entirely outside the block
            plane = stack[i * W + j]
            plane[sx_lo:sx_hi, sy_lo:sy_hi] = data[sx_lo + dx:sx_hi + dx,
                                                   sy_lo + dy:sy_hi + dy]
            # mask out offsets beyond the clamped window of each position
            gx = np.arange(xdim) + dx
            gy = np.arange(ydim) + dy
            bad_x = (gx < xa) | (gx > xb)
            bad_y = (gy < ya) | (gy > yb)
            plane[bad_x, :] = np.nan
            plane[:, bad_y] = np.nan
    return np.nanmedian(stack, axis=0)


def apply_median_filtering(obj: InferCNV, window_size: int = 7,
                           on_observations: bool = True,
                           on_references: bool = True) -> InferCNV:
    """In-place median filtering per (subcluster|ref group) x chromosome."""
    if window_size % 2 != 1 or window_size < 3:
        # the reference stop()s here (noise_reduction.R:52-54); silently
        # returning unfiltered data as "median filtered" is worse
        raise ValueError("window_size must be an odd number >= 3")

    blocks = []
    if on_observations:
        if obj.tumor_subclusters is not None:
            for tumor_type in obj.obs_groups:
                subs = obj.tumor_subclusters["subclusters"].get(
                    tumor_type, {tumor_type: obj.obs_groups[tumor_type]})
                blocks.extend(np.asarray(v) for v in subs.values())
        else:
            blocks.extend(np.asarray(v) for v in obj.obs_groups.values())
    if on_references:
        blocks.extend(np.asarray(v) for v in obj.ref_groups.values())

    expr = np.asarray(obj.expr, np.float64)
    for cell_idx in blocks:
        if cell_idx.size == 0:
            continue
        for (b, e) in obj.gene_order.chr_ranges():
            if e <= b:
                continue
            block = expr[np.ix_(cell_idx, np.arange(b, e))].T  # [G_chr, cells]
            expr[np.ix_(cell_idx, np.arange(b, e))] = _median_filter_block(
                block, window_size).T
    obj.expr = expr.astype(np.float32)
    return obj
