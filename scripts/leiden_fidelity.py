#!/usr/bin/env python
"""Quantify Leiden subcluster structure at scale (PARITY.md "Leiden at
scale"; VERDICT r3 item 3).

For each size: build the full PCA->kNN->SNN route on synthetic data with
planted subclones, then report

* gamma = the reference auto resolution (11.98/n)^(1/1.165),
* SNN connected components (a hard LOWER bound on the partition count for
  any CPM Leiden — merging disconnected communities changes CPM by
  -gamma*n1*n2 < 0),
* our Leiden partition count and its CPM score vs the component partition
  and the planted truth (objective-level fidelity: a higher score is a
  partition igraph's cluster_leiden would also prefer),
* purity of the partition w.r.t. planted subclones.

Runs on CPU (forced) so it can execute next to a TPU job.

Usage: python scripts/leiden_fidelity.py [--sizes 1000,5000,20000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from scipy import sparse  # noqa: E402


def cpm_score(A, memb, gamma):
    memb = np.asarray(memb)
    score = 0.0
    for m in set(memb.tolist()):
        sel = np.nonzero(memb == m)[0]
        w_in = A[np.ix_(sel, sel)].sum() / 2.0
        nc = sel.size
        score += w_in - gamma * nc * (nc - 1) / 2.0
    return float(score)


def synth(n, k_planted, G=600, seed=7):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 0.08, (n, G)).astype(np.float32) + 1.0
    per = n // k_planted
    planted = np.zeros(n, int)
    for c in range(k_planted):
        lo = c * per
        hi = n if c == k_planted - 1 else lo + per
        b0 = (c * 97) % (G - 120)
        x[lo:hi, b0:b0 + 100] += 0.55
        planted[lo:hi] = c
    return x, planted


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1000,5000,20000")
    ap.add_argument("--k_planted", type=int, default=6)
    args = ap.parse_args()

    from infercnv_tpu.subcluster.distance import knn_indices
    from infercnv_tpu.subcluster.leiden import auto_resolution, leiden, snn_graph
    from infercnv_tpu.subcluster.pca import pca_embed

    print(f"{'n':>7} {'gamma':>10} {'snn_comp':>8} {'k_leiden':>8} "
          f"{'pure':>5} {'cpm_ours':>12} {'cpm_comp':>12} {'cpm_planted':>12} {'sec':>6}")
    for n in [int(s) for s in args.sizes.split(",")]:
        t0 = time.perf_counter()
        x, planted = synth(n, args.k_planted)
        emb = pca_embed(x, n_components=10)
        nn = np.asarray(knn_indices(emb, 20))
        A = snn_graph(nn, n)
        gamma = auto_resolution(n)
        n_comp, comp = sparse.csgraph.connected_components(A, directed=False)
        part = leiden(A, gamma, objective="CPM", seed=0)
        k = len(set(part.tolist()))
        pure = all(len(set(planted[part == m].tolist())) == 1
                   for m in set(part.tolist()))
        ours = cpm_score(A, part, gamma)
        c_comp = cpm_score(A, comp, gamma)
        c_pl = cpm_score(A, planted, gamma)
        dt = time.perf_counter() - t0
        print(f"{n:>7} {gamma:>10.3e} {n_comp:>8} {k:>8} "
              f"{str(pure):>5} {ours:>12.1f} {c_comp:>12.1f} {c_pl:>12.1f} {dt:>6.1f}")
        assert ours >= c_comp - 1e-6 and ours >= c_pl - 1e-6


if __name__ == "__main__":
    main()
