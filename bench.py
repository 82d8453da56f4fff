#!/usr/bin/env python
"""Benchmark: cells/sec/chip for the smoothing+HMM pass (BASELINE.json metric).

Runs the fused CNV engine chunk step (depth-norm -> log -> ref-subtract ->
pyramidal smooth (w=101) -> median-center -> ref-subtract -> unlog ->
per-cell 6-state Viterbi over 22 chromosomes) on synthetic data with the
bundled example's genome shape (~8.5k genes), streamed in cell chunks on
the real TPU chip.

The reference (broadinstitute/infercnv) publishes no benchmark numbers
(BASELINE.md) and R is not installed in this image, so ``vs_baseline``
is measured against a single-threaded NumPy implementation of the same
smoothing+Viterbi pass, which is the same class of vectorized C loops
(stats::filter / caTools::runmean / R Viterbi) the reference runs on CPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def numpy_baseline_cells_per_sec(go, hmm, counts, norm_factor, n_cells=16):
    """Single-threaded numpy smoothing+viterbi on n_cells, per-cell rate."""
    from infercnv_tpu.ops.smoothing import smooth_window_reference

    x = counts[:n_cells].astype(np.float64)
    means, sds, t = hmm.means, hmm.sds, hmm.t
    sd = np.median(sds)
    S = means.shape[0]
    logPi = np.log(np.full((S, S), t) + np.eye(S) * (1 - S * t))
    delta = np.full(S, t)
    delta[(S - 1) // 2] = 1 - (S - 1) * t
    from scipy.stats import norm as snorm

    t0 = time.perf_counter()
    cs = x.sum(axis=1, keepdims=True)
    xl = np.log2(x / cs * norm_factor + 1.0)
    ref_means = xl.mean(axis=0)
    xl = np.clip(xl - ref_means, -3, 3)
    sm = np.empty_like(xl)
    for (b, e) in go.chr_ranges():
        if e - b > 1:
            sm[:, b:e] = smooth_window_reference(xl[:, b:e].T, 101).T
        else:
            sm[:, b:e] = xl[:, b:e]
    sm = sm - np.median(sm, axis=1, keepdims=True)
    resid = np.exp2(sm - sm.mean(axis=0))
    for c in range(n_cells):
        for (b, e) in go.chr_ranges():
            n = e - b
            if n < 2:
                continue
            xx = resid[c, b:e]
            z = np.abs(xx[:, None] - means[None, :]) / sd
            logp = snorm.logsf(z)
            em = 1.0 / (-logp)
            em = np.log(em / em.sum(axis=1, keepdims=True))
            nu = np.zeros((n, S))
            bp = np.zeros((n, S), np.int64)
            nu[0] = np.log(delta) + em[0]
            for i in range(1, n):
                scores = nu[i - 1][:, None] + logPi
                bp[i] = scores.argmax(axis=0)
                nu[i] = scores.max(axis=0) + em[i]
            y = nu[-1].argmax()
            for i in range(n - 2, -1, -1):
                y = bp[i + 1][y]
    dt = time.perf_counter() - t0
    return n_cells / dt


def main():
    import jax
    import jax.numpy as jnp

    from infercnv_tpu.core.genome import GeneOrder
    from infercnv_tpu.models.hmm import HMMParams
    from infercnv_tpu.parallel.engine import CnvEngine, EngineConfig

    # genome shaped like the bundled example post-filter: 8448 genes, 22 chrs
    n_chr = 22
    sizes = np.linspace(800, 120, n_chr).astype(int)
    sizes = (sizes / sizes.sum() * 8448).astype(int)
    sizes[0] += 8448 - sizes.sum()
    G = int(sizes.sum())
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=tuple(f"chr{i+1}" for i in range(n_chr)),
        chr_ids=np.repeat(np.arange(n_chr), sizes).astype(np.int32),
        start=np.arange(G), stop=np.arange(G),
    )
    hmm = HMMParams(
        means=np.array([0.135, 0.631, 1.0, 1.346, 1.702, 2.237]),
        sds=np.array([0.221, 0.252, 0.211, 0.288, 0.341, 0.457]),
        t=1e-6,
    )
    engine = CnvEngine(go, hmm, EngineConfig())

    chunk = 8192
    rng = np.random.default_rng(0)
    gene_means = rng.gamma(2.0, 30.0, G).astype(np.float32)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    counts_a = jax.random.poisson(k1, jnp.asarray(gene_means)[None, :] *
                                  jnp.ones((chunk, 1))).astype(jnp.float32)
    counts_b = jax.random.poisson(k2, jnp.asarray(gene_means)[None, :] *
                                  jnp.ones((chunk, 1))).astype(jnp.float32)
    ref_counts = jax.random.poisson(k3, jnp.asarray(gene_means)[None, :] *
                                    jnp.ones((256, 1))).astype(jnp.float32)

    norm_factor = float(np.median(np.asarray(counts_a).sum(axis=1)))
    ml, mr, _ = engine.ref_stats(ref_counts, norm_factor)

    # warmup / compile
    r, s = engine.full_chunk(counts_a, norm_factor, ml, mr)
    jax.block_until_ready((r, s))

    n_iter = 12  # ~100k cells
    t0 = time.perf_counter()
    outs = []
    for i in range(n_iter):
        c = counts_a if i % 2 == 0 else counts_b
        outs = engine.full_chunk(c, norm_factor, ml, mr)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    cells_per_sec = n_iter * chunk / dt

    base = numpy_baseline_cells_per_sec(
        go, hmm, np.asarray(counts_a), norm_factor)

    print(json.dumps({
        "metric": "smooth_hmm_cells_per_sec_per_chip",
        "value": round(cells_per_sec, 1),
        "unit": "cells/s",
        "vs_baseline": round(cells_per_sec / base, 1),
    }))


if __name__ == "__main__":
    sys.exit(main())
