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


def _group_cell_order(obj: InferCNV, group: str, idx: np.ndarray,
                      cluster: bool, order_cache: Optional[dict] = None):
    """Row ordering within one group plus the dendrogram that produced it:
    stored subcluster structure first (largest subcluster leading, as the
    reference's stitched dendrograms, subclusters joined at raised roots),
    each ordered by ward-linkage leaf order (PC1 order above
    ORDER_LINKAGE_MAX cells); else fresh hclust.

    order_cache: optional dict shared across the pipeline's plots — the
    reference orders every pane (preliminary, HMM states, proxy values,
    final) by the SAME stored expression dendrograms, so later plots reuse
    the ordering computed once on the expression matrix instead of
    re-clustering a state matrix (also ~minutes per plot at 100k cells).

    Returns (order_indices, merged_linkage_or_None)."""
    if idx.size <= 2 or not cluster:
        return idx, None
    if order_cache is not None and group in order_cache:
        o, Z = order_cache[group]
        if o.size == idx.size:
            return o, Z
    o, Z = _group_cell_order_impl(obj, group, idx)
    if order_cache is not None:
        order_cache[group] = (o, Z)
    return o, Z


def _group_cell_order_impl(obj: InferCNV, group: str, idx: np.ndarray):
    from scipy.cluster import hierarchy

    from infercnv_tpu.subcluster.distance import condensed_dists
    from infercnv_tpu.viz.dendro import merge_linkages

    subs = None
    if obj.tumor_subclusters and group in obj.tumor_subclusters["subclusters"]:
        subs = obj.tumor_subclusters["subclusters"][group]
    if subs and len(subs) > 1:
        block_idx = []
        block_Z = []
        for _name, sidx in sorted(subs.items(), key=lambda kv: -len(kv[1])):
            sidx = np.asarray(sidx)
            if sidx.size > ORDER_LINKAGE_MAX:
                block_idx.append(sidx[_pc1_order(obj.expr[sidx])])
                block_Z.append(None)
            elif sidx.size > 2:
                Z = hierarchy.linkage(condensed_dists(obj.expr[sidx]), method="ward")
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
        return idx[_pc1_order(obj.expr[idx])], None
    Z = hierarchy.linkage(condensed_dists(obj.expr[idx]), method="ward")
    return idx[hierarchy.leaves_list(Z)], Z


def _downsample_rows(mat: np.ndarray, group_sizes: List[Tuple[str, int]],
                     max_rows: int):
    """Mean-aggregate consecutive rows (within group boundaries, so
    separators stay exact) down to <= max_rows display rows — the raster
    step the reference gets from image(useRaster=TRUE) (inst/NEWS:164),
    done explicitly so a 10^5-10^6-row pane renders in seconds.

    Returns (matrix, new_group_sizes, was_downsampled)."""
    n = mat.shape[0]
    if n <= max_rows:
        return mat, group_sizes, False
    out_blocks = []
    new_sizes: List[Tuple[str, int]] = []
    acc = 0
    for g, size in group_sizes:
        block = mat[acc:acc + size]
        nb = min(size, max(1, int(round(max_rows * size / n))))
        edges = np.linspace(0, size, nb + 1).astype(int)
        down = np.add.reduceat(block, edges[:-1], axis=0) / np.diff(edges)[:, None]
        out_blocks.append(down.astype(np.float32))
        new_sizes.append((g, nb))
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
) -> Optional[str]:
    """Render the heatmap; returns the output image path.

    dynamic_resize (reference inferCNV_heatmap.R:254-262): with > 200
    observation cells, the figure height grows by
    ``dynamic_resize * 3.6 * (nobs - 200) / 200`` inches so large runs keep
    per-cell resolution."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.colors import Normalize

    os.makedirs(out_dir, exist_ok=True)
    expr = np.asarray(obj.expr, np.float32)
    if x_center is None:
        x_center = float(np.mean(expr))
    if isinstance(x_range, str) and x_range == "auto":
        lo, hi = get_x_range_auto(expr, x_center)
    elif x_range is None:
        lo, hi = get_x_range_auto(expr, x_center)
    else:
        lo, hi = float(x_range[0]), float(x_range[1])
    data = np.clip(expr, lo, hi)

    # display-space transform (bp-proportional x axis if requested)
    if plot_chr_scale:
        disp, disp_bounds = _bp_scale_matrix(data, obj.gene_order, chr_lengths)
    else:
        disp, disp_bounds = data, None

    # ordering
    obs_order: List[np.ndarray] = []
    obs_group_sizes: List[Tuple[str, int]] = []
    obs_linkages: List = []
    if cluster_by_groups:
        for g, idx in obj.obs_groups.items():
            o, Z = _group_cell_order(obj, g, np.asarray(idx), True,
                                     row_order_cache)
            obs_order.append(o)
            obs_group_sizes.append((g, o.size))
            obs_linkages.append(Z)
    else:
        idx = obj.all_obs_idx()
        o, Zo = _group_cell_order(obj, "all_observations", idx, True,
                                  row_order_cache)
        obs_linkages.append(Zo)
        if k_obs_groups > 1 and idx.size > k_obs_groups:
            from scipy.cluster import hierarchy

            from infercnv_tpu.subcluster.distance import condensed_dists

            Z = hierarchy.linkage(condensed_dists(obj.expr[idx]), method="ward")
            grps = hierarchy.fcluster(Z, t=k_obs_groups, criterion="maxclust")
            leaf = hierarchy.leaves_list(Z)
            o = idx[leaf]
            obs_group_sizes = [(f"obs_grp_{g}", int((grps == g).sum())) for g in np.unique(grps)]
        else:
            obs_group_sizes = [("all_observations", o.size)]
        obs_order = [o]
    obs_idx = np.concatenate(obs_order) if obs_order else np.zeros(0, np.int64)

    ref_order: List[np.ndarray] = []
    ref_group_sizes: List[Tuple[str, int]] = []
    ref_linkages: List = []
    for g, idx in obj.ref_groups.items():
        o, Zr = _group_cell_order(obj, g, np.asarray(idx), cluster_references,
                                  row_order_cache)
        ref_order.append(o)
        ref_group_sizes.append((g, o.size))
        ref_linkages.append(Zr)
    ref_idx = np.concatenate(ref_order) if ref_order else np.zeros(0, np.int64)

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
        spans = disp_bounds + [disp.shape[1]]
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
        W = disp.shape[1]
        acc = 0
        for (g, size) in group_sizes:
            ax.text(W + W * 0.005, n - (acc + size / 2), str(g)[:30],
                    fontsize=5, va="center", ha="left", clip_on=False)
            acc += size

    obs_mat, obs_sizes_d, obs_down = _downsample_rows(
        disp[obs_idx], obs_group_sizes, max_pane_rows)
    pane(ax_obs, obs_mat, obs_sizes_d, obs_title)
    ref_down = False
    if have_ref:
        for i, (o, (g, size)) in enumerate(zip(ref_order, ref_group_sizes)):
            m, sz_d, down_i = _downsample_rows(disp[o], [(g, size)],
                                               max(64, max_pane_rows // 4))
            ref_down = ref_down or down_i
            pane(ref_axes[i], m, sz_d,
                 ref_title if i == (len(ref_order) - 1) // 2 else "")

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
                         [Zr] if not ref_down else [],
                         [(g, size)] if not ref_down else [], size)

    # color key with value-density histogram (the vendored heatmap.cnv key,
    # reference inferCNV_heatmap.R:1461-1474, density.info='histogram')
    kax = fig.add_axes([0.015, 0.82, 0.09, 0.1])
    grad = np.linspace(lo, hi, 256)[None, :]
    kax.imshow(grad, aspect="auto", cmap=cmap, norm=norm,
               extent=(lo, hi, 0.0, 1.0))
    counts, edges = np.histogram(data, bins=50, range=(lo, hi))
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

        linkages, labels = {}, {}
        for g, idx in obj.obs_groups.items():
            idx = np.asarray(idx)
            labels[g] = [obj.cell_names[i] for i in idx]
            linkages[g] = (hierarchy.linkage(condensed_dists(obj.expr[idx]), method="ward")
                           if idx.size > 2 else None)
        nwk = merged_group_newick(linkages, labels)
        with open(os.path.join(out_dir, f"{output_filename}.observations_dendrogram.txt"), "w") as f:
            f.write(nwk + "\n")

    # text outputs (reference :803-846)
    with open(os.path.join(out_dir, f"{output_filename}.observation_groupings.txt"), "w") as f:
        f.write("cell_group_name cell\n")
        pos = 0
        for (g, size), rows in zip(obs_group_sizes, obs_order):
            for r in rows:
                f.write(f"{g} {obj.cell_names[r]}\n")
    with open(os.path.join(out_dir, f"{output_filename}.heatmap_thresholds.txt"), "w") as f:
        for v in np.linspace(lo, hi, 31):
            f.write(f"{v}\n")
    if write_expr:
        write_expr_matrix(os.path.join(out_dir, f"{output_filename}.observations.txt"),
                          data, obj.gene_order, obj.cell_names, obs_idx)
        if have_ref:
            write_expr_matrix(os.path.join(out_dir, f"{output_filename}.references.txt"),
                              data, obj.gene_order, obj.cell_names, ref_idx)
    return out_path
