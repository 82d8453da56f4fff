"""Per-group plotting and cell sampling.

reference: R/infercnv_sampling.R — sample_object (:52-429) down-samples
cells keeping at least one per subcluster (rewriting the stored trees), and
plot_per_group (:505-661) splits the object per annotation group and renders
one heatmap per group on a common color scale.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from infercnv_tpu.core.object import InferCNV
from infercnv_tpu.utils.logging import log_info
from infercnv_tpu.viz.heatmap import get_x_range_auto, plot_cnv


def sample_object(obj: InferCNV, n_cells: int = 1000,
                  every_n: Optional[int] = None,
                  above_m: Optional[int] = 1000,
                  on_references: bool = True,
                  on_observations: bool = True,
                  seed: int = 1234) -> InferCNV:
    """Downsample cells per group to n_cells (or 1 in every_n), keeping at
    least one cell per subcluster (reference sample_object :52-429)."""
    rng = np.random.default_rng(seed)
    keep: list = []

    def sample_group(group: str, idx: np.ndarray, apply: bool):
        idx = np.asarray(idx)
        if not apply or (above_m is not None and idx.size <= above_m):
            keep.extend(idx.tolist())
            return
        target = max(1, idx.size // every_n) if every_n else min(n_cells, idx.size)
        subs: Dict[str, np.ndarray] = {}
        if obj.tumor_subclusters and group in obj.tumor_subclusters["subclusters"]:
            subs = obj.tumor_subclusters["subclusters"][group]
        if subs:
            # proportional allocation, >= 1 per subcluster
            sizes = {k: len(v) for k, v in subs.items()}
            total = sum(sizes.values())
            alloc = {k: max(1, int(round(target * s / total))) for k, s in sizes.items()}
            for k, sidx in subs.items():
                sidx = np.asarray(sidx)
                n = min(alloc[k], sidx.size)
                keep.extend(sorted(rng.choice(sidx, size=n, replace=False).tolist()))
        else:
            keep.extend(sorted(rng.choice(idx, size=target, replace=False).tolist()))

    for g, idx in obj.ref_groups.items():
        sample_group(g, idx, on_references)
    for g, idx in obj.obs_groups.items():
        sample_group(g, idx, on_observations)

    keep_arr = np.array(sorted(set(keep)), np.int64)
    remap = {old: new for new, old in enumerate(keep_arr)}

    def remap_groups(groups):
        out = {}
        for g, idx in groups.items():
            kept = [remap[i] for i in np.asarray(idx) if i in remap]
            if kept:
                out[g] = np.array(kept, np.int64)
        return out

    new_obj = InferCNV(
        expr=obj.expr[keep_arr],
        counts=obj.counts[keep_arr] if obj.counts.shape == obj.expr.shape else obj.counts,
        gene_order=obj.gene_order,
        cell_names=[obj.cell_names[i] for i in keep_arr],
        ref_groups=remap_groups(obj.ref_groups),
        obs_groups=remap_groups(obj.obs_groups),
        options=dict(obj.options),
    )
    if obj.tumor_subclusters:
        new_subs = {}
        for g, subs in obj.tumor_subclusters["subclusters"].items():
            gsub = {}
            for k, idx in subs.items():
                kept = [remap[i] for i in np.asarray(idx) if i in remap]
                if kept:
                    gsub[k] = np.array(kept, np.int64)
            if gsub:
                new_subs[g] = gsub
        new_obj.tumor_subclusters = {"subclusters": new_subs, "hc": {}}
    log_info(f"sample_object: {obj.num_cells} -> {new_obj.num_cells} cells")
    return new_obj


def plot_per_group(obj: InferCNV, out_dir: str,
                   on_references: bool = True,
                   on_observations: bool = True,
                   sample: bool = False,
                   n_cells: int = 1000,
                   every_n: Optional[int] = None,
                   above_m: int = 1000,
                   base_filename: str = "infercnv_per_group",
                   output_format: str = "png",
                   png_res: int = 150) -> list:
    """One heatmap per annotation group on a shared color scale
    (reference plot_per_group :505-661)."""
    os.makedirs(out_dir, exist_ok=True)
    center = float(np.mean(obj.expr))
    lo, hi = get_x_range_auto(np.asarray(obj.expr), center)
    out_paths = []

    def one(group: str, idx: np.ndarray, is_ref: bool):
        idx = np.asarray(idx)
        sub = InferCNV(
            expr=obj.expr[idx],
            counts=obj.expr[idx],
            gene_order=obj.gene_order,
            cell_names=[obj.cell_names[i] for i in idx],
            ref_groups={},
            obs_groups={group: np.arange(idx.size)},
        )
        if obj.tumor_subclusters and group in obj.tumor_subclusters["subclusters"]:
            remap = {old: new for new, old in enumerate(idx)}
            subs = {}
            for k, sidx in obj.tumor_subclusters["subclusters"][group].items():
                kept = [remap[i] for i in np.asarray(sidx) if i in remap]
                if kept:
                    subs[k] = np.array(kept, np.int64)
            sub.tumor_subclusters = {"subclusters": {group: subs}, "hc": {}}
        if sample and sub.num_cells > above_m:
            sub = sample_object(sub, n_cells=n_cells, every_n=every_n,
                                above_m=above_m)
        safe = "".join(ch if ch.isalnum() else "_" for ch in group)
        tag = "ref" if is_ref else "obs"
        path = plot_cnv(
            sub, out_dir=out_dir,
            output_filename=f"{base_filename}.{tag}_{safe}",
            title=f"inferCNV — {group}",
            x_center=center, x_range=(lo, hi),
            output_format=output_format, png_res=png_res,
        )
        out_paths.append(path)

    if on_references:
        for g, idx in obj.ref_groups.items():
            one(g, idx, True)
    if on_observations:
        for g, idx in obj.obs_groups.items():
            one(g, idx, False)
    return out_paths
