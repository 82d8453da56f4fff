"""CNV heatmap rendering — analogue of plot_cnv
(reference R/inferCNV_heatmap.R:90-470 + the vendored heatmap engine
:1374-2768), rebuilt on matplotlib.

Layout mirrors the reference: a chromosome color bar on top, the
observation (tumor) pane with per-group separators and dendrogram-derived
row ordering, reference pane(s) below, blue-white-red palette centered on
x.center with x.range auto-derived from the 1%/99% quantiles of
off-center values (:155-167).  Also writes the text outputs
(.observations.txt, .references.txt, .observation_groupings.txt,
heatmap_thresholds.txt) the downstream tooling consumes.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from infercnv_tpu.core.object import InferCNV
from infercnv_tpu.report.regions import write_expr_matrix
from infercnv_tpu.utils.logging import log_info, log_warn


def get_x_range_auto(expr_cg: np.ndarray, x_center: float) -> Tuple[float, float]:
    """1% / 99% quantiles of values away from the center, symmetrized
    (reference inferCNV_heatmap.R:155-167)."""
    vals = expr_cg[expr_cg != x_center]
    if vals.size == 0:
        return x_center - 1.0, x_center + 1.0
    lo = np.quantile(vals, 0.01)
    hi = np.quantile(vals, 0.99)
    delta = max(abs(lo - x_center), abs(hi - x_center))
    low = x_center - delta
    high = x_center + delta
    if low == high:
        low, high = x_center - 1, x_center + 1
    return float(low), float(high)


def color_palette(color_safe: bool = False):
    """Blue-white-red ramp (reference color.palette inferCNV_ops.R:1808-1835:
    'darkblue', 'white', 'darkred'); color_safe uses the colorblind-safe
    purple-white-green ramp (reference plot_cnv color_safe_pal)."""
    from matplotlib.colors import LinearSegmentedColormap

    if color_safe:
        return LinearSegmentedColormap.from_list(
            "infercnv_safe", ["#40004B", "#FFFFFF", "#00441B"], N=255)
    return LinearSegmentedColormap.from_list(
        "infercnv", ["#00008B", "#FFFFFF", "#8B0000"], N=255)


CHR_BAR_COLORS = [
    "#8DD3C7", "#FFFFB3", "#BEBADA", "#FB8072", "#80B1D3", "#FDB462",
    "#B3DE69", "#FCCDE5", "#D9D9D9", "#BC80BD", "#CCEBC5", "#FFED6F",
]


#: Per-block row-ordering switches from O(n^2) Ward linkage to a 1-D
#: principal-component ordering above this many cells (the drawn dendrogram
#: is omitted for such blocks; the reference leans on useRaster at scale,
#: inst/NEWS:164, but still pays the hclust).
ORDER_LINKAGE_MAX = 3000


def _pc1_order(x_cg: np.ndarray, iters: int = 12, seed: int = 0) -> np.ndarray:
    """Row order by projection onto the first principal component — an
    O(n*G) stand-in for dendrogram leaf order on very large panes (rows with
    similar CNV profiles still land next to each other)."""
    x = np.asarray(x_cg, np.float32)
    x = x - x.mean(axis=0, keepdims=True)
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(x.shape[1]).astype(np.float32)
    for _ in range(iters):
        v = x.T @ (x @ v)
        nv = np.linalg.norm(v)
        if nv == 0:
            return np.arange(x.shape[0])
        v /= nv
    return np.argsort(x @ v, kind="stable")


#: R hclust method names -> scipy linkage methods (reference accepts the R
#: set via plot_cnv(hclust_method=...), inferCNV_heatmap.R:103,117-118)
R_TO_SCIPY_LINKAGE = {
    "ward.D": "ward", "ward.D2": "ward", "ward": "ward",
    "complete": "complete", "average": "average", "single": "single",
    "centroid": "centroid", "median": "median", "mcquitty": "weighted",
    "weighted": "weighted",
}


def _group_cell_order(obj: InferCNV, group: str, idx: np.ndarray,
                      cluster: bool, order_cache: Optional[dict] = None,
                      hclust_method: str = "ward.D",
                      gene_sel: Optional[np.ndarray] = None,
                      ignore_subclusters: bool = False):
    """Row ordering within one group plus the dendrogram that produced it:
    stored subcluster structure first (largest subcluster leading, as the
    reference's stitched dendrograms, subclusters joined at raised roots),
    each ordered by hclust leaf order (PC1 order above ORDER_LINKAGE_MAX
    cells); else fresh hclust with the requested linkage method.

    gene_sel / ignore_subclusters implement the reference's ref_contig:
    cluster on the named contig's genes only, bypassing stored subclusters
    (inferCNV_heatmap.R:553-573).

    order_cache: optional dict shared across the pipeline's plots — the
    reference orders every pane (preliminary, HMM states, proxy values,
    final) by the SAME stored expression dendrograms, so later plots reuse
    the ordering computed once on the expression matrix instead of
    re-clustering a state matrix (also ~minutes per plot at 100k cells).

    Returns (order_indices, merged_linkage_or_None)."""
    if idx.size <= 2 or not cluster:
        return idx, None
    key = (group, hclust_method,
           None if gene_sel is None else gene_sel.tobytes())
    if order_cache is not None and key in order_cache:
        o, Z = order_cache[key]
        if o.size == idx.size:
            return o, Z
    o, Z = _group_cell_order_impl(obj, group, idx,
                                  R_TO_SCIPY_LINKAGE.get(hclust_method, "ward"),
                                  gene_sel, ignore_subclusters)
    if order_cache is not None:
        order_cache[key] = (o, Z)
    return o, Z


def _group_cell_order_impl(obj: InferCNV, group: str, idx: np.ndarray,
                           method: str = "ward",
                           gene_sel: Optional[np.ndarray] = None,
                           ignore_subclusters: bool = False):
    from scipy.cluster import hierarchy

    from infercnv_tpu.subcluster.distance import condensed_dists
    from infercnv_tpu.viz.dendro import merge_linkages

    def rows(sel):
        x = obj.expr[sel]
        return x if gene_sel is None else x[:, gene_sel]

    subs = None
    if (not ignore_subclusters and obj.tumor_subclusters
            and group in obj.tumor_subclusters["subclusters"]):
        subs = obj.tumor_subclusters["subclusters"][group]
    if subs and len(subs) > 1:
        block_idx = []
        block_Z = []
        for _name, sidx in sorted(subs.items(), key=lambda kv: -len(kv[1])):
            sidx = np.asarray(sidx)
            if sidx.size > ORDER_LINKAGE_MAX:
                block_idx.append(sidx[_pc1_order(rows(sidx))])
                block_Z.append(None)
            elif sidx.size > 2:
                Z = hierarchy.linkage(condensed_dists(rows(sidx)), method=method)
                block_idx.append(sidx[hierarchy.leaves_list(Z)])
                block_Z.append(Z)
            else:
                block_idx.append(sidx)
                block_Z.append(None)
        concat = np.concatenate(block_idx)
        Zm = merge_linkages(block_Z, [b.size for b in block_idx])
        if Zm is not None:
            # order the pane by the merged tree's own leaf traversal so the
            # drawn dendrogram lines up with the rows
            leaves = hierarchy.leaves_list(Zm)
            return concat[leaves], Zm
        return concat, None
    if idx.size > ORDER_LINKAGE_MAX:
        return idx[_pc1_order(rows(idx))], None
    Z = hierarchy.linkage(condensed_dists(rows(idx)), method=method)
    return idx[hierarchy.leaves_list(Z)], Z


def _pane_edges(group_sizes: List[Tuple[str, int]], max_rows: int):
    """Display-bin edges per group (same allocation as _downsample_rows:
    proportional bins within group boundaries, so separators stay exact).
    Returns (edges_per_group, new_sizes, downsampled?)."""
    n = sum(s for _g, s in group_sizes)
    if n <= max_rows:
        return None, group_sizes, False
    eds: List[np.ndarray] = []
    new_sizes: List[Tuple[str, int]] = []
    for g, size in group_sizes:
        nb = min(size, max(1, int(round(max_rows * size / n))))
        eds.append(np.linspace(0, size, nb + 1).astype(int))
        new_sizes.append((g, nb))
    return eds, new_sizes, True


def _pane_matrix_dense(expr: np.ndarray, idx_ordered: np.ndarray,
                       group_sizes: List[Tuple[str, int]], max_rows: int,
                       lo: float, hi: float,
                       lut: Optional[np.ndarray] = None):
    """Display matrix for one pane straight from the SOURCE rows: each
    display bin is the mean of its member cells' clipped rows.  The full
    [C, G] matrix is only READ (scattered row gathers); nothing full-size
    is written — on hosts where writes are 50x slower than reads this is
    the difference between seconds and minutes at 100k cells.

    lut: optional value table for small-int sources (state matrices);
    display values are lut[source]."""

    def vals(block):
        block = lut[block] if lut is not None else block
        return np.clip(block, lo, hi)

    edges, new_sizes, down = _pane_edges(group_sizes, max_rows)
    G = expr.shape[1]
    if not down:
        return vals(expr[idx_ordered]).astype(np.float32, copy=False), \
            new_sizes, False
    out = np.empty((sum(s for _g, s in new_sizes), G), np.float32)
    row = 0
    acc = 0
    for (g, size), ed in zip(group_sizes, edges):
        rows = idx_ordered[acc:acc + size]
        for k in range(len(ed) - 1):
            out[row] = vals(expr[rows[ed[k]:ed[k + 1]]]).mean(axis=0)
            row += 1
        acc += size
    return out, new_sizes, True


def _pane_matrix_rows(rows_kg: np.ndarray, cell_to_row: np.ndarray,
                      idx_ordered: np.ndarray,
                      group_sizes: List[Tuple[str, int]], max_rows: int,
                      lo: float, hi: float):
    """Display matrix for one pane from FACTORIZED per-group values
    (rows [K, G] + cell->row map): the expanded [C, G] matrix is never
    materialized — each display bin mixes the few distinct group rows its
    member cells map to (state/proxy plots at 100k cells render in O(K*G))."""
    rows_kg = np.clip(np.asarray(rows_kg, np.float32), lo, hi)
    ids_ordered = cell_to_row[idx_ordered]
    edges, new_sizes, down = _pane_edges(group_sizes, max_rows)
    if not down:
        return rows_kg[ids_ordered], new_sizes, False
    G = rows_kg.shape[1]
    out = np.empty((sum(s for _g, s in new_sizes), G), np.float32)
    row = 0
    acc = 0
    for (g, size), ed in zip(group_sizes, edges):
        ids = ids_ordered[acc:acc + size]
        for k in range(len(ed) - 1):
            sel = ids[ed[k]:ed[k + 1]]
            uniq, cnt = np.unique(sel, return_counts=True)
            out[row] = (cnt.astype(np.float32) @ rows_kg[uniq]) / sel.size
            row += 1
        acc += size
    return out, new_sizes, True


#: Full-matrix exact statistics (quantile x_range, histogram) are computed
#: only below this many elements; above it they come from a seeded row
#: sample / the display rows (logged).  8.9e8 elements (100k x 8.9k) would
#: otherwise cost a full-size partition copy per plot.
EXACT_STATS_MAX_ELEMS = 200_000_000


def _downsample_rows(mat: np.ndarray, group_sizes: List[Tuple[str, int]],
                     max_rows: int):
    """Mean-aggregate consecutive rows (within group boundaries, so
    separators stay exact) down to <= max_rows display rows — the raster
    step the reference gets from image(useRaster=TRUE) (inst/NEWS:164),
    done explicitly so a 10^5-10^6-row pane renders in seconds.

    Returns (matrix, new_group_sizes, was_downsampled).  Bin allocation is
    shared with the render path (_pane_edges) so the two cannot drift."""
    edges_list, new_sizes, down = _pane_edges(group_sizes, max_rows)
    if not down:
        return mat, group_sizes, False
    out_blocks = []
    acc = 0
    for (g, size), edges in zip(group_sizes, edges_list):
        block = mat[acc:acc + size]
        down_b = np.add.reduceat(block, edges[:-1], axis=0) / np.diff(edges)[:, None]
        out_blocks.append(down_b.astype(np.float32))
        acc += size
    return np.concatenate(out_blocks), new_sizes, True


def _bp_scale_matrix(data: np.ndarray, gene_order, chr_lengths=None,
                     width: int = 3000) -> Tuple[np.ndarray, List[int]]:
    """Resample gene columns onto a bp-proportional axis
    (reference plot_chr_scale, inferCNV_heatmap.R:352-397).  Returns the
    resampled matrix and per-chromosome boundary bin indices."""
    ranges = gene_order.chr_ranges()
    lens = []
    for ci, (b, e) in enumerate(ranges):
        if chr_lengths is not None and ci < len(chr_lengths):
            lens.append(int(chr_lengths[ci]))
        elif e > b:
            lens.append(int(gene_order.stop[b:e].max()))
        else:
            lens.append(1)
    total = float(sum(lens))
    bins = [max(2, int(round(width * l / total))) for l in lens]
    out_cols = []
    boundaries = [0]
    for ci, (b, e) in enumerate(ranges):
        nb = bins[ci]
        block = np.full((data.shape[0], nb), np.nan, np.float32)
        if e > b:
            mid = (gene_order.start[b:e] + gene_order.stop[b:e]) / 2.0
            pos = np.clip((mid / max(lens[ci], 1) * nb).astype(int), 0, nb - 1)
            for k in range(nb):
                sel = pos == k
                if sel.any():
                    block[:, k] = data[:, b:e][:, sel].mean(axis=1)
            # fill empty bins with nearest filled bin
            filled = ~np.isnan(block[0])
            if filled.any():
                idxs = np.arange(nb)
                nearest = idxs.copy()
                fi = idxs[filled]
                for k in idxs[~filled]:
                    nearest[k] = fi[np.argmin(np.abs(fi - k))]
                block = block[:, nearest]
        out_cols.append(block)
        boundaries.append(boundaries[-1] + nb)
    return np.concatenate(out_cols, axis=1), boundaries[:-1]


def plot_cnv(
    obj: InferCNV,
    out_dir: str,
    output_filename: str = "infercnv",
    title: str = "inferCNV",
    k_obs_groups: int = 1,
    cluster_by_groups: bool = True,
    cluster_references: bool = True,
    x_center: Optional[float] = None,
    x_range="auto",
    custom_color_pal=None,
    output_format: str = "png",
    png_res: int = 150,
    write_expr: bool = False,
    write_phylo: bool = False,
    plot_chr_scale: bool = False,
    chr_lengths=None,
    color_safe_pal: bool = False,
    contig_lab_size: int = 6,
    obs_title: str = "Observations (Cells)",
    ref_title: str = "References (Cells)",
    dynamic_resize: float = 0.0,
    max_pane_rows: int = 2000,
    row_order_cache: Optional[dict] = None,
    row_values: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    value_lut: Optional[np.ndarray] = None,
    hclust_method: str = "ward.D",
    ref_contig=None,
) -> Optional[str]:
    """Render the heatmap; returns the output image path.

    dynamic_resize (reference inferCNV_heatmap.R:254-262): with > 200
    observation cells, the figure height grows by
    ``dynamic_resize * 3.6 * (nobs - 200) / 200`` inches so large runs keep
    per-cell resolution.

    Large-matrix design: the source matrix is only READ (row gathers into
    per-pane display bins, _pane_matrix_dense); no clipped/reordered copy
    of the full [C, G] matrix is ever written.  Two factorized inputs avoid
    even the read pass:

    * ``row_values=(rows [K, G], cell_to_row [C])`` — per-group values
      (HMM state calls); panes render in O(K*G).  ``obj.expr`` is then only
      consulted for row ordering (usually a row_order_cache hit).
    * ``value_lut`` — obj.expr holds small ints (a state matrix); display
      values are ``value_lut[state]``, applied per display block.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.colors import Normalize

    os.makedirs(out_dir, exist_ok=True)
    expr = np.asarray(obj.expr)
    rows_kg = cell_to_row = None
    if row_values is not None:
        rows_kg = np.asarray(row_values[0], np.float32)
        cell_to_row = np.asarray(row_values[1], np.int64)
    elif value_lut is None and expr.dtype != np.float32:
        expr = expr.astype(np.float32)
    lut = None if value_lut is None else np.asarray(value_lut, np.float32)

    exact_stats = rows_kg is None and lut is None and \
        expr.size <= EXACT_STATS_MAX_ELEMS

    def _value_sample() -> np.ndarray:
        """Representative float values for center/range/histogram when the
        exact full-matrix statistics would be too expensive."""
        if rows_kg is not None:
            return rows_kg
        step = max(1, expr.shape[0] // 4096)
        s = expr[::step]
        return lut[s] if lut is not None else s

    if x_center is None:
        if rows_kg is not None:
            w = np.bincount(cell_to_row, minlength=rows_kg.shape[0]).astype(np.float64)
            x_center = float((w @ rows_kg.mean(axis=1)) / w.sum())
        elif lut is not None:
            cnt = np.bincount(expr.ravel(), minlength=lut.size)
            x_center = float(np.nansum(cnt * np.nan_to_num(lut)) / cnt.sum())
        else:
            x_center = float(np.mean(expr))
    if isinstance(x_range, str) and x_range == "auto" or x_range is None:
        if exact_stats:
            lo, hi = get_x_range_auto(expr, x_center)
        else:
            lo, hi = get_x_range_auto(_value_sample(), x_center)
            log_info("-x_range: estimated from sampled/factorized rows")
    else:
        lo, hi = float(x_range[0]), float(x_range[1])

    # ordering.  ref_contig (reference inferCNV_heatmap.R:553-573): cluster
    # rows on the named contig's genes only, ignoring stored subclusters.
    gene_sel = None
    if ref_contig is not None:
        want = {ref_contig} if isinstance(ref_contig, str) else set(ref_contig)
        names = obj.gene_order.chr_names
        gene_sel = np.nonzero(np.isin(
            [names[c] for c in obj.gene_order.chr_ids], list(want)))[0]
        if gene_sel.size == 0:
            log_warn(f"ref_contig {ref_contig!r} matched no genes; "
                     "clustering by all genomic locations")
            gene_sel = None

    def order_group(group, idx, cluster):
        return _group_cell_order(obj, group, idx, cluster, row_order_cache,
                                 hclust_method=hclust_method,
                                 gene_sel=gene_sel,
                                 ignore_subclusters=gene_sel is not None)

    obs_order: List[np.ndarray] = []
    obs_group_sizes: List[Tuple[str, int]] = []
    obs_linkages: List = []
    if cluster_by_groups:
        for g, idx in obj.obs_groups.items():
            o, Z = order_group(g, np.asarray(idx), True)
            obs_order.append(o)
            obs_group_sizes.append((g, o.size))
            obs_linkages.append(Z)
    else:
        idx = obj.all_obs_idx()
        if (k_obs_groups > 1 and k_obs_groups < idx.size
                and idx.size <= ORDER_LINKAGE_MAX):
            # cut the SAME linkage that orders the rows into k blocks; the
            # result is cached like any other ordering (state/proxy plots
            # reuse the expression split instead of re-clustering states).
            # Block sizes follow LEAF order — fcluster labels are contiguous
            # along the leaves (each cluster is a subtree) but not sorted.
            kkey = ("all_observations@k", hclust_method,
                    None if gene_sel is None else gene_sel.tobytes(),
                    k_obs_groups)
            cached = (row_order_cache or {}).get(kkey)
            if cached is not None and cached[0].size == idx.size:
                o, (Zo, obs_group_sizes) = cached
            else:
                from scipy.cluster import hierarchy

                from infercnv_tpu.subcluster.distance import condensed_dists

                rows_for_split = obj.expr[idx]
                if gene_sel is not None:  # ref_contig drives this split too
                    rows_for_split = rows_for_split[:, gene_sel]
                Zo = hierarchy.linkage(
                    condensed_dists(rows_for_split),
                    method=R_TO_SCIPY_LINKAGE.get(hclust_method, "ward"))
                grps = hierarchy.fcluster(Zo, t=k_obs_groups,
                                          criterion="maxclust")
                leaf = hierarchy.leaves_list(Zo)
                o = idx[leaf]
                labs = grps[leaf]
                change = np.nonzero(np.diff(labs))[0] + 1
                bounds = np.concatenate([[0], change, [labs.size]])
                obs_group_sizes = [
                    (f"obs_grp_{labs[b]}", int(e - b))
                    for b, e in zip(bounds[:-1], bounds[1:])]
                if row_order_cache is not None:
                    row_order_cache[kkey] = (o, (Zo, obs_group_sizes))
            obs_linkages.append(Zo)
        else:
            o, Zo = order_group("all_observations", idx, True)
            obs_linkages.append(Zo)
            if k_obs_groups > 1 and k_obs_groups < idx.size:
                log_warn(f"k_obs_groups={k_obs_groups} needs a full linkage "
                         f"but the pane has {idx.size} cells (> "
                         f"{ORDER_LINKAGE_MAX}); keeping one group")
            obs_group_sizes = [("all_observations", o.size)]
        obs_order = [o]
    obs_idx = np.concatenate(obs_order) if obs_order else np.zeros(0, np.int64)

    ref_order: List[np.ndarray] = []
    ref_group_sizes: List[Tuple[str, int]] = []
    ref_linkages: List = []
    for g, idx in obj.ref_groups.items():
        o, Zr = order_group(g, np.asarray(idx), cluster_references)
        ref_order.append(o)
        ref_group_sizes.append((g, o.size))
        ref_linkages.append(Zr)
    ref_idx = np.concatenate(ref_order) if ref_order else np.zeros(0, np.int64)

    # display pane matrices straight from the source (downsample-first)
    def build_pane(idx_ordered, sizes, cap):
        if rows_kg is not None:
            return _pane_matrix_rows(rows_kg, cell_to_row, idx_ordered,
                                     sizes, cap, lo, hi)
        return _pane_matrix_dense(expr, idx_ordered, sizes, cap, lo, hi, lut)

    obs_mat, obs_sizes_d, obs_down = build_pane(obs_idx, obs_group_sizes,
                                                max_pane_rows)
    ref_mats: List[Tuple[np.ndarray, List[Tuple[str, int]]]] = []
    ref_downs: List[bool] = []  # per pane: one big group's downsampling
    # must not blank the other panes' valid dendrograms
    for o, (g, size) in zip(ref_order, ref_group_sizes):
        m, sz_d, di = build_pane(o, [(g, size)], max(64, max_pane_rows // 4))
        ref_mats.append((m, sz_d))
        ref_downs.append(di)

    # display-space transform (bp-proportional x axis if requested) — on
    # the downsampled panes, never the full matrix
    disp_bounds = None
    if plot_chr_scale:
        obs_mat, disp_bounds = _bp_scale_matrix(obs_mat, obj.gene_order,
                                                chr_lengths)
        ref_mats = [(_bp_scale_matrix(m, obj.gene_order, chr_lengths)[0], sz)
                    for m, sz in ref_mats]
    W = obs_mat.shape[1] if obs_mat.size else (
        ref_mats[0][0].shape[1] if ref_mats else expr.shape[1])

    # figure
    G = obj.num_genes
    n_obs, n_ref = obs_idx.size, ref_idx.size
    have_ref = n_ref > 0
    fig_h = 8.0
    if dynamic_resize and dynamic_resize > 0 and n_obs > 200:
        fig_h += dynamic_resize * 3.6 * (n_obs - 200) / 200.0
        fig_h = min(fig_h, 32767 / max(png_res, 1))  # cairo-style pixel cap
    ref_frac = min(0.35, max(0.12, n_ref / max(n_obs + n_ref, 1))) if have_ref else 0.0
    nrows = 3 if have_ref else 2
    fig = plt.figure(figsize=(11.6, fig_h))
    gs = fig.add_gridspec(
        nrows, 2,
        height_ratios=([0.035, 1 - ref_frac, ref_frac] if have_ref else [0.035, 1.0]),
        width_ratios=[0.05, 0.95], hspace=0.06, wspace=0.01,
        left=0.07, right=0.93)
    ax_chr = fig.add_subplot(gs[0, 1])
    ax_obs = fig.add_subplot(gs[1, 1])
    ax_obs_dend = fig.add_subplot(gs[1, 0])
    # each reference group gets its OWN pane with its own dendrogram
    # (reference .plot_cnv_references draws per-group panes,
    # inferCNV_heatmap.R:985+), heights proportional to group size
    ref_axes: List = []
    ref_dend_axes: List = []
    if have_ref:
        hr = [max(int(s), 1) for (_g, s) in ref_group_sizes]
        sub = gs[2, 1].subgridspec(len(ref_order), 1, hspace=0.08,
                                   height_ratios=hr)
        subd = gs[2, 0].subgridspec(len(ref_order), 1, hspace=0.08,
                                    height_ratios=hr)
        ref_axes = [fig.add_subplot(sub[i]) for i in range(len(ref_order))]
        ref_dend_axes = [fig.add_subplot(subd[i]) for i in range(len(ref_order))]
    fig.add_subplot(gs[0, 0]).axis("off")

    # chromosome bar
    from matplotlib.colors import ListedColormap

    if plot_chr_scale:
        spans = disp_bounds + [W]
        bar = np.concatenate([
            np.full(spans[ci + 1] - spans[ci], ci % len(CHR_BAR_COLORS))
            for ci in range(len(disp_bounds))
        ])[None, :]
        label_pos = [(spans[ci] + spans[ci + 1]) / 2 for ci in range(len(disp_bounds))]
        boundaries = list(disp_bounds)
        chr_labels = list(obj.gene_order.chr_names)[: len(disp_bounds)]
    else:
        chr_ids = obj.gene_order.chr_ids
        bar = np.array([int(c) % len(CHR_BAR_COLORS) for c in chr_ids])[None, :]
        boundaries = []
        label_pos = []
        chr_labels = []
        for ci, (b, e) in enumerate(obj.gene_order.chr_ranges()):
            if e > b:
                boundaries.append(b)
                label_pos.append((b + e) / 2)
                chr_labels.append(obj.gene_order.chr_names[ci])
    ax_chr.imshow(bar, aspect="auto", cmap=ListedColormap(CHR_BAR_COLORS),
                  vmin=0, vmax=len(CHR_BAR_COLORS) - 1, interpolation="nearest")
    ax_chr.set_yticks([])
    ax_chr.set_xticks([])
    for pos, lab in zip(label_pos, chr_labels):
        ax_chr.text(pos, -0.8, lab, ha="center", va="bottom",
                    fontsize=contig_lab_size)
    ax_chr.set_title(title, fontsize=11, pad=16)

    if custom_color_pal is not None and not hasattr(custom_color_pal, "N"):
        # a sequence of colors (reference custom_pal = color.palette(...)):
        # build the ramp from them
        from matplotlib.colors import LinearSegmentedColormap

        custom_color_pal = LinearSegmentedColormap.from_list(
            "infercnv_custom", list(custom_color_pal), N=255)
    cmap = custom_color_pal or color_palette(color_safe_pal)
    norm = Normalize(vmin=lo, vmax=hi)

    def pane(ax, mat, group_sizes, label):
        if mat.shape[0] == 0:
            ax.axis("off")
            return
        ax.imshow(mat[::-1], aspect="auto", cmap=cmap, norm=norm,
                  interpolation="nearest")
        for b in boundaries[1:]:
            ax.axvline(b - 0.5, color="black", lw=0.4)
        acc = 0
        n = mat.shape[0]
        for (_g, size) in group_sizes[:-1]:
            acc += size
            ax.axhline(n - acc - 0.5, color="black", lw=0.6)
        ax.set_yticks([])
        ax.set_xticks([])
        if label:
            ax.set_ylabel(label, fontsize=8)
            ax.yaxis.set_label_coords(-0.075, 0.5)
        # group labels on the right
        acc = 0
        for (g, size) in group_sizes:
            ax.text(W + W * 0.005, n - (acc + size / 2), str(g)[:30],
                    fontsize=5, va="center", ha="left", clip_on=False)
            acc += size

    pane(ax_obs, obs_mat, obs_sizes_d, obs_title)
    if have_ref:
        for i, (m, sz_d) in enumerate(ref_mats):
            pane(ref_axes[i], m, sz_d,
                 ref_title if i == (len(ref_mats) - 1) // 2 else "")

    # dendrogram side panels (reference draws the row trees beside each pane)
    from infercnv_tpu.viz.dendro import draw_linkage

    def dendro_panel(ax, linkages, group_sizes, n_rows):
        ax.axis("off")
        if n_rows == 0:
            return
        acc = 0
        for Z, (_g, size) in zip(linkages, group_sizes):
            if Z is not None and size > 2:
                draw_linkage(ax, Z, n_rows, acc, size)
            acc += size
        ax.set_xlim(0, 1)
        ax.set_ylim(0, n_rows)

    # downsampled panes have no 1:1 row mapping for the tree leaves
    dendro_panel(ax_obs_dend, obs_linkages if not obs_down else [],
                 obs_group_sizes if not obs_down else [], n_obs)
    if have_ref:
        for i, (Zr, (g, size)) in enumerate(zip(ref_linkages, ref_group_sizes)):
            dendro_panel(ref_dend_axes[i],
                         [Zr] if not ref_downs[i] else [],
                         [(g, size)] if not ref_downs[i] else [], size)

    # color key with value-density histogram (the vendored heatmap.cnv key,
    # reference inferCNV_heatmap.R:1461-1474, density.info='histogram')
    kax = fig.add_axes([0.015, 0.82, 0.09, 0.1])
    grad = np.linspace(lo, hi, 256)[None, :]
    kax.imshow(grad, aspect="auto", cmap=cmap, norm=norm,
               extent=(lo, hi, 0.0, 1.0))
    hist_src = expr if exact_stats else _value_sample()
    hist_w = None
    if rows_kg is not None:
        # factorized panes: weight each group row by its cell count, so the
        # density curve reflects the plotted [C, G] distribution, not one
        # vote per subcluster row
        w = np.bincount(cell_to_row,
                        minlength=rows_kg.shape[0]).astype(np.float64)
        hist_w = np.broadcast_to(w[:, None], rows_kg.shape)
    counts, edges = np.histogram(np.clip(hist_src, lo, hi), bins=50,
                                 range=(lo, hi), weights=hist_w)
    if counts.max() > 0:
        dens = counts / counts.max()
        kax.plot((edges[:-1] + edges[1:]) / 2, dens, color="cyan", lw=0.7)
    kax.set_yticks([])
    kax.set_xticks([lo, x_center, hi])
    kax.set_xticklabels([f"{lo:.2f}", f"{x_center:.2f}", f"{hi:.2f}"])
    kax.tick_params(labelsize=5)
    kax.set_title("Distribution of Expression", fontsize=5)

    ext = output_format if output_format in ("png", "pdf", "svg") else "png"
    out_path = os.path.join(out_dir, f"{output_filename}.{ext}")
    fig.savefig(out_path, dpi=png_res, bbox_inches="tight")
    plt.close(fig)
    log_info(f"-wrote heatmap: {out_path}")

    if write_phylo:
        from scipy.cluster import hierarchy

        from infercnv_tpu.report.newick import merged_group_newick
        from infercnv_tpu.subcluster.distance import condensed_dists

        method = R_TO_SCIPY_LINKAGE.get(hclust_method, "ward")
        linkages, labels = {}, {}
        for g, idx in obj.obs_groups.items():
            idx = np.asarray(idx)
            if idx.size > ORDER_LINKAGE_MAX:
                # a per-cell newick needs an O(n^2) condensed matrix — at
                # 100k cells that is ~40 GB; skip the group rather than OOM
                log_warn(f"write_phylo: skipping group {g!r} "
                         f"({idx.size} cells > {ORDER_LINKAGE_MAX})")
                continue
            labels[g] = [obj.cell_names[i] for i in idx]
            linkages[g] = (hierarchy.linkage(condensed_dists(obj.expr[idx]),
                                             method=method)
                           if idx.size > 2 else None)
        nwk = merged_group_newick(linkages, labels)
        with open(os.path.join(out_dir, f"{output_filename}.observations_dendrogram.txt"), "w") as f:
            f.write(nwk + "\n")

    # text outputs (reference :803-846)
    with open(os.path.join(out_dir, f"{output_filename}.observation_groupings.txt"), "w") as f:
        f.write("cell_group_name cell\n")
        # walk obs_idx by the group sizes (obs_order may be a single
        # concatenated array in the k_obs_groups split, where zipping it
        # against the k sizes would label every cell with group 1)
        pos = 0
        for (g, size) in obs_group_sizes:
            for r in obs_idx[pos:pos + size]:
                f.write(f"{g} {obj.cell_names[r]}\n")
            pos += size
    with open(os.path.join(out_dir, f"{output_filename}.heatmap_thresholds.txt"), "w") as f:
        for v in np.linspace(lo, hi, 31):
            f.write(f"{v}\n")
    if write_expr:
        # the one output that inherently needs the full clipped matrix —
        # materialized only on request
        if rows_kg is not None:
            data = np.clip(rows_kg, lo, hi)[cell_to_row]
        elif lut is not None:
            data = np.clip(lut[expr], lo, hi)
        else:
            data = np.clip(expr, lo, hi)
        write_expr_matrix(os.path.join(out_dir, f"{output_filename}.observations.txt"),
                          data, obj.gene_order, obj.cell_names, obs_idx)
        if have_ref:
            write_expr_matrix(os.path.join(out_dir, f"{output_filename}.references.txt"),
                              data, obj.gene_order, obj.cell_names, ref_idx)
    return out_path
