#!/usr/bin/env python
"""BASELINE config 4: Bayesian mixture filtering at 100k cells.

Builds a synthetic 100k-cell / 8,448-gene / 22-chromosome dataset with 32
tumor subclusters and ~50 planted non-neutral CNV regions, calibrates a
REAL hspike (built from a 512-cell sample through the mirrored transform
chain, exactly as run() does), then times `bayesian_filter_states` — the
full step-18/19 path: region extraction from the state matrix, the
sufficient-statistic log-likelihood (two MXU matmuls over [C, G] x [G, R]),
the padded-group blocked Gibbs (6 chains x 1200 sweeps), removeCNV +
reassignCNV, and the CNV_State_Probabilities.dat write.

reference equivalent: inferCNVBayesNet + filterHighPNormals
(R/inferCNV_BayesNet.R:1237-1440), which runs JAGS serially per region via
mclapply (:407-430) — at this scale each JAGS region model would hold
[genes x cells] nodes in the graph; the R path has never been demonstrated
at 100k cells.

Usage: python benchmarks/bayes100k.py [--cells 100000]
"""

import argparse
import json
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def build_genome(G=8448, n_chr=22):
    from infercnv_tpu.core.genome import GeneOrder

    sizes = np.linspace(800, 120, n_chr).astype(int)
    sizes = (sizes / sizes.sum() * G).astype(int)
    sizes[0] += G - sizes.sum()
    return GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=tuple(f"chr{i+1}" for i in range(n_chr)),
        chr_ids=np.repeat(np.arange(n_chr), sizes).astype(np.int32),
        start=np.arange(G) * 1000, stop=np.arange(G) * 1000 + 500,
    ), sizes


def calibrated_hspike(go, seed=0):
    """A real hspike: simulate counts for a 512-cell object on the same
    genome, build + mirror it through the step-4-14 chain (what run() does)."""
    from infercnv_tpu.core.object import InferCNV
    from infercnv_tpu.models.hspike import build_hspike
    from infercnv_tpu.ops import transforms as T
    from infercnv_tpu.runner.config import RunConfig
    from infercnv_tpu.runner.pipeline import _hspike_residual_chain

    rng = np.random.default_rng(seed)
    G = go.num_genes
    gene_means = rng.gamma(2.0, 30.0, G)
    counts = rng.poisson(gene_means[None, :] * np.ones((512, 1))).astype(np.float32)
    obj = InferCNV(
        expr=counts.copy(), counts=counts, gene_order=go,
        cell_names=[f"h{i}" for i in range(512)],
        ref_groups={"normal": np.arange(256)},
        obs_groups={"tumor": np.arange(256, 512)},
    )
    obj.expr = np.asarray(T.normalize_counts_by_seq_depth(obj.expr))
    h = build_hspike(obj, sim_method="meanvar", seed=12345)
    _hspike_residual_chain(h, RunConfig(out_dir="."), 3.0)
    return h


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=100_000)
    ap.add_argument("--subclusters", type=int, default=32)
    args = ap.parse_args()

    from infercnv_tpu.core.object import InferCNV
    from infercnv_tpu.models.bayes import bayesian_filter_states
    from infercnv_tpu.models import hmm as hmm_mod

    C = args.cells
    K = args.subclusters
    go, sizes = build_genome()
    G = go.num_genes

    t0 = time.perf_counter()
    hspike = calibrated_hspike(go)
    cnv_mean_sd = hmm_mod.get_spike_dists(hspike)
    mu = np.array([cnv_mean_sd[lvl][0] for lvl in hmm_mod.I6_LEVELS])
    t_hspike = time.perf_counter() - t0
    print(f"# hspike calibration: {t_hspike:.1f}s, state means {np.round(mu, 3)}")

    # residual-space expression (what step 18 consumes) with planted regions
    rng = np.random.default_rng(1)
    n_ref = C // 10
    expr = rng.normal(1.0, 0.18, (C, G)).astype(np.float32)
    states = np.full((C, G), 3, np.int8)

    # subclusters over the tumor cells; each gets 1-2 planted regions
    tumor_idx = np.arange(n_ref, C)
    sub_bounds = np.linspace(0, tumor_idx.size, K + 1).astype(int)
    subclusters = {}
    chr_ranges = go.chr_ranges()
    planted = []
    for k in range(K):
        sidx = tumor_idx[sub_bounds[k]:sub_bounds[k + 1]]
        subclusters[f"tumor_s{k+1}"] = sidx
        for j in range(1 + (k % 2)):
            ci = (3 * k + 7 * j) % len(chr_ranges)
            b, e = chr_ranges[ci]
            span = max(40, (e - b) // 3)
            gsel = np.arange(b, min(b + span, e))
            if (k + j) % 2 == 0:
                expr[np.ix_(sidx, gsel)] = rng.normal(
                    mu[1], 0.18, (sidx.size, gsel.size))  # deletion level
                states[np.ix_(sidx, gsel)] = 2
                planted.append((k, gsel, 2))
            else:
                expr[np.ix_(sidx, gsel)] = rng.normal(
                    mu[3], 0.18, (sidx.size, gsel.size))  # gain level
                states[np.ix_(sidx, gsel)] = 4
                planted.append((k, gsel, 4))

    obj = InferCNV(
        expr=expr, counts=None, gene_order=go,
        cell_names=[f"c{i}" for i in range(C)],
        ref_groups={"normal": np.arange(n_ref)},
        obs_groups={"tumor": tumor_idx},
        tumor_subclusters={"hc": {}, "subclusters": {
            "tumor": subclusters, "normal": {"normal_s1": np.arange(n_ref)}}},
    )

    with tempfile.TemporaryDirectory() as td:
        t1 = time.perf_counter()
        new_states, result = bayesian_filter_states(
            obj, states.astype(np.int32), hmm_type="i6", BayesMaxPNormal=0.5,
            hspike=hspike, out_dir=td, report_by="subcluster")
        dt = time.perf_counter() - t1

    R = len(result.regions)
    n_removed = len(result.removed_regions)
    # every planted region must survive the P(normal) filter and keep a
    # non-neutral argmax on its side of neutral
    probs = result.cnv_state_probabilities  # [S, R]
    p_normal = probs[2]
    assert R >= len(planted), f"planted {len(planted)} regions, modeled {R}"
    assert n_removed <= R // 10, f"filter removed {n_removed}/{R} planted regions"
    ok_dir = 0
    for ri, rdesc in enumerate(result.regions):
        am = int(np.argmax(probs[:, ri]))
        if (rdesc["state"] < 3) == (am < 2) or (rdesc["state"] > 3) == (am > 2):
            ok_dir += 1
    print(f"# regions modeled: {R}; removed: {n_removed}; "
          f"direction-consistent argmax: {ok_dir}/{R}; "
          f"max P(normal): {p_normal.max():.3f}")
    assert ok_dir >= int(0.9 * R)

    print(json.dumps({
        "metric": "bayes_filter_100k_wall_clock",
        "cells": C, "regions": R, "chains": 6, "sweeps": 1200,
        "value": round(dt, 2), "unit": "s",
        "cells_per_sec": round(C / dt, 1),
    }))


if __name__ == "__main__":
    main()
