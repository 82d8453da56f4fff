#!/usr/bin/env python
"""BASELINE flagship config: the PRODUCT pipeline — run() — at 1M cells.

Everything the 100k benchmark does (REAL Leiden subclustering over
PCA/SNN, i6 HMM on subcluster means, Bayes filtering, denoise, region
reports, downsampled plots), at 10x the cells, on ONE chip, with bounded
host RSS:

  * counts are generated streamed as uint16 (18 GB instead of 72 GB of
    float64 temporaries) and stream to the device at HALF the link bytes
    (the fused residual kernel converts u16 in VMEM);
  * the engine's residual comes back as float16 (engine_transfer_dtype)
    and lands in a DISK-BACKED float32 memmap (residual_memmap_gb) — the
    34 GB matrix never holds host RAM hostage;
  * subclustering slices each group lazily from the memmap (no full-size
    gene-filtered copy), and step 22 denoises block-wise in place.

reference counterpart: run() (R/inferCNV_ops.R:242-1652) — the reference
is single-process R with O(n^2) subclustering and has never been run at
this scale.

Usage: python benchmarks/scale1m_run.py [--cells 1000000] [--no-plot]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def synth_counts_streamed(C, G=9000, n_chr=22, n_groups=3, seed=0,
                          gen_counts=True):
    """Same planted-CNV generator as scale100k_run.py, but Poisson-sampled
    in row blocks straight into a preallocated uint16 matrix."""
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
    ranges = go.chr_ranges()
    planted = {}
    tumor_groups = {}
    n_groups_eff = n_groups
    per_grp = (C - n_ref) // n_groups_eff
    factors = np.ones((n_groups_eff + 1, G))  # row 0 = reference factor
    for gi in range(n_groups_eff):
        lo = n_ref + gi * per_grp
        hi = C if gi == n_groups_eff - 1 else lo + per_grp
        tumor_groups[f"malignant_{gi+1}"] = np.arange(lo, hi)
        dci, aci = (2 * gi + 1) % n_chr, (2 * gi + 2) % n_chr
        db, de = ranges[dci]
        ab, ae = ranges[aci]
        factors[gi + 1, db:de] = 0.5
        factors[gi + 1, ab:ae] = 2.0
        planted[f"malignant_{gi+1}"] = (np.arange(db, de), np.arange(ab, ae))
    if not gen_counts:
        ref_groups = {"normal_a": np.arange(0, n_ref // 2),
                      "normal_b": np.arange(n_ref // 2, n_ref)}
        return go, None, ref_groups, tumor_groups, planted
    counts = np.empty((C, G), np.uint16)
    bounds = [0, n_ref] + [n_ref + gi * per_grp for gi in range(1, n_groups_eff)] + [C]
    for row_grp in range(n_groups_eff + 1):
        lo, hi = bounds[row_grp], bounds[row_grp + 1]
        lam = gene_means * factors[row_grp]
        for b in range(lo, hi, 50_000):
            e = min(b + 50_000, hi)
            counts[b:e] = rng.poisson(
                lam[None, :], (e - b, G)).astype(np.uint16)
    ref_groups = {"normal_a": np.arange(0, n_ref // 2),
                  "normal_b": np.arange(n_ref // 2, n_ref)}
    return go, counts, ref_groups, tumor_groups, planted


def peak_rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmHWM"):
                return round(int(line.split()[1]) / 1e6, 2)
    return -1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=1_000_000)
    ap.add_argument("--no-plot", action="store_true")
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--counts_cache", default=None,
                    help="path to cache the generated uint16 counts "
                         "(re-launches skip the ~20 min generation)")
    args = ap.parse_args()

    from infercnv_tpu.core.object import InferCNV
    from infercnv_tpu.runner.pipeline import run

    C = args.cells
    t0 = time.perf_counter()
    cache = args.counts_cache
    if cache and os.path.exists(cache):
        go, _c, ref_groups, tumor_groups, planted = synth_counts_streamed(
            C, gen_counts=False)
        counts = np.load(cache)
        assert counts.shape == (C, go.num_genes), counts.shape
        print(f"# loaded cached counts {counts.shape} from {cache} in "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
    else:
        go, counts, ref_groups, tumor_groups, planted = synth_counts_streamed(C)
        if cache:
            np.save(cache, counts)
        print(f"# generated {C} cells x {go.num_genes} genes (uint16, "
              f"{counts.nbytes/1e9:.1f} GB) in {time.perf_counter()-t0:.1f}s",
              flush=True)

    obj = InferCNV(
        expr=counts, counts=counts, gene_order=go,
        cell_names=[f"c{i}" for i in range(C)],
        ref_groups=ref_groups, obs_groups=tumor_groups,
    )
    del counts  # the object owns the matrix; keep ONE host reference

    out_dir = args.out_dir or tempfile.mkdtemp(prefix="icnv1m_")
    t1 = time.perf_counter()
    res = run(obj, out_dir=out_dir,
              cutoff=1.0, analysis_mode="subclusters", HMM=True, denoise=True,
              tumor_subcluster_partition_method="leiden",
              no_plot=args.no_plot, save_rds=False,
              inspect_subclusters=False,
              engine_chunk_cells=32768,
              engine_transfer_dtype="float16",
              residual_memmap_gb=20.0)
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
        sub = idx[:: max(1, idx.size // 20000)]  # state sampling: verdicts
        # are per-subcluster constants, a 20k-cell sample is exact enough
        df = (st[np.ix_(sub, dsel)] < 3).mean()
        af = (st[np.ix_(sub, asel)] > 3).mean()
        print(f"# {g}: planted del called {df:.2f}, amp called {af:.2f}",
              flush=True)
        calls_ok += int(df > 0.7) + int(af > 0.7)
    ref_idx = final.all_ref_idx()
    neu = (st[ref_idx[:: max(1, ref_idx.size // 20000)]] == 3).mean()
    print(f"# reference neutral fraction: {neu:.3f}; subclusters: {n_sub}")
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
                continue

    print(json.dumps({
        "metric": "run_e2e_1m_leiden_hmm_wall_clock",
        "cells": C, "genes": int(final.num_genes),
        "subclusters": int(n_sub),
        "value": round(dt, 2), "unit": "s",
        "cells_per_sec": round(C / dt, 1),
        "peak_host_rss_gb": peak_rss_gb(),
        "step_timings": timings,
        "out_dir": out_dir,
    }), flush=True)


if __name__ == "__main__":
    main()
