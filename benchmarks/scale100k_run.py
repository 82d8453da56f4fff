#!/usr/bin/env python
"""BASELINE config 3: the PRODUCT pipeline — run() — at 100k cells with
REAL Leiden subclustering, i6 HMM per subcluster, Bayes filtering, denoise
and plots.  Nothing is pre-assigned: counts go in, run() does steps 2-23
(gene filter, depth norm + hspike, fused engine transform, Leiden over
PCA/SNN with the native C++ partitioner, bin-packed Pallas Viterbi on
subcluster means, padded-group Gibbs filter, region reports, downsampled
heatmaps).

reference: example/run.R's default configuration (analysis_mode =
'subclusters', HMM=TRUE, denoise=TRUE) scaled to 100k cells — the
reference's own step 15 (define_signif_tumor_subclusters,
R/inferCNV_tumor_subclusters.R:569-643) is O(n^2) in parallelDist/hclust
and has never been demonstrated at this scale.

Usage: python benchmarks/scale100k_run.py [--cells 100000] [--no-plot]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def synth_counts(C, G=9000, n_chr=22, n_groups=3, seed=0):
    """Counts with 2 normal groups + tumor groups carrying group-specific
    planted CNVs (one deletion + one amplification chromosome arm each)."""
    from infercnv_tpu.core.genome import GeneOrder

    sizes = np.linspace(800, 120, n_chr).astype(int)
    sizes = (sizes / sizes.sum() * G).astype(int)
    sizes[0] += G - sizes.sum()
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=tuple(f"chr{i+1}" for i in range(n_chr)),
        chr_ids=np.repeat(np.arange(n_chr), sizes).astype(np.int32),
        start=np.arange(G) * 1000, stop=np.arange(G) * 1000 + 500,
    )
    rng = np.random.default_rng(seed)
    gene_means = rng.gamma(2.0, 8.0, G)
    n_ref = C // 5
    lam = np.broadcast_to(gene_means[None, :], (C, G)).copy()
    ranges = go.chr_ranges()
    planted = {}
    tumor_groups = {}
    per_grp = (C - n_ref) // n_groups
    for gi in range(n_groups):
        lo = n_ref + gi * per_grp
        hi = C if gi == n_groups - 1 else lo + per_grp
        idx = np.arange(lo, hi)
        tumor_groups[f"malignant_{gi+1}"] = idx
        dci, aci = (2 * gi + 1) % n_chr, (2 * gi + 2) % n_chr
        db, de = ranges[dci]
        ab, ae = ranges[aci]
        lam[lo:hi, db:de] *= 0.5
        lam[lo:hi, ab:ae] *= 2.0
        planted[f"malignant_{gi+1}"] = (np.arange(db, de), np.arange(ab, ae))
    counts = rng.poisson(lam).astype(np.float32)
    ref_groups = {"normal_a": np.arange(0, n_ref // 2),
                  "normal_b": np.arange(n_ref // 2, n_ref)}
    return go, counts, ref_groups, tumor_groups, planted


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=100_000)
    ap.add_argument("--no-plot", action="store_true")
    ap.add_argument("--out_dir", default=None)
    args = ap.parse_args()

    from infercnv_tpu.core.object import InferCNV
    from infercnv_tpu.runner.pipeline import run

    C = args.cells
    t0 = time.perf_counter()
    go, counts, ref_groups, tumor_groups, planted = synth_counts(C)
    t_gen = time.perf_counter() - t0
    print(f"# generated {C} cells x {go.num_genes} genes in {t_gen:.1f}s",
          flush=True)

    obj = InferCNV(
        expr=counts.copy(), counts=counts, gene_order=go,
        cell_names=[f"c{i}" for i in range(C)],
        ref_groups=ref_groups, obs_groups=tumor_groups,
    )

    out_dir = args.out_dir or tempfile.mkdtemp(prefix="icnv100k_")
    t1 = time.perf_counter()
    res = run(obj, out_dir=out_dir,
              cutoff=1.0, analysis_mode="subclusters", HMM=True, denoise=True,
              tumor_subcluster_partition_method="leiden",
              no_plot=args.no_plot, save_rds=False,
              inspect_subclusters=False)
    dt = time.perf_counter() - t1

    # --- verify the product outputs -------------------------------------
    st = res.hmm_states
    final = res.infercnv_obj
    n_sub = sum(len(s) for s in final.tumor_subclusters["subclusters"].values())
    gene_lut = {n: i for i, n in enumerate(final.gene_order.names)}
    calls_ok = 0
    for g, idx in tumor_groups.items():
        del_genes, amp_genes = planted[g]
        dsel = [gene_lut[f"g{i}"] for i in del_genes if f"g{i}" in gene_lut]
        asel = [gene_lut[f"g{i}"] for i in amp_genes if f"g{i}" in gene_lut]
        df = (st[np.ix_(idx, dsel)] < 3).mean()
        af = (st[np.ix_(idx, asel)] > 3).mean()
        print(f"# {g}: planted del called {df:.2f}, amp called {af:.2f}")
        calls_ok += int(df > 0.7) + int(af > 0.7)
    ref_idx = final.all_ref_idx()
    neu = (st[ref_idx] == 3).mean()
    print(f"# reference neutral fraction: {neu:.3f}; subclusters found: {n_sub}")
    assert calls_ok == 2 * len(tumor_groups), "planted CNVs not all called"
    assert neu > 0.95
    assert n_sub >= len(tumor_groups)
    report = [f for f in os.listdir(out_dir) if f.endswith("pred_cnv_regions.dat")]
    assert report, "region reports missing"
    if not args.no_plot:
        assert any(f.startswith("infercnv.png") or f == "infercnv.png"
                   for f in os.listdir(out_dir)), "final heatmap missing"

    timings = {}
    tsv = os.path.join(out_dir, "step_timings.tsv")
    if os.path.exists(tsv):
        for line in open(tsv):
            k, v = line.strip().split("\t")[:2]
            try:
                timings[k] = round(float(v), 2)
            except ValueError:
                continue  # header row

    print(json.dumps({
        "metric": "run_e2e_100k_leiden_hmm_wall_clock",
        "cells": C, "genes": int(final.num_genes),
        "subclusters": int(n_sub),
        "value": round(dt, 2), "unit": "s",
        "cells_per_sec": round(C / dt, 1),
        "step_timings": timings,
        "out_dir": out_dir,
    }))


if __name__ == "__main__":
    main()
