"""1M-cell single-chip streaming demo: counts are generated and consumed
chunk-by-chunk (a 1M x 8.4k matrix is ~34 GB and never exists in HBM), with
CNV-state summaries reduced on device."""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from infercnv_tpu.core.genome import GeneOrder
from infercnv_tpu.models.hmm import HMMParams
from infercnv_tpu.parallel.engine import CnvEngine, EngineConfig


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main(C_total=1_048_576, chunk=8192, mode="cells"):
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
        sds=np.array([0.221, 0.252, 0.211, 0.288, 0.341, 0.457]), t=1e-6)
    engine = CnvEngine(go, hmm, EngineConfig())
    log(f"engine ready; streaming {C_total} cells in {C_total // chunk} chunks")

    rng = np.random.default_rng(0)
    gm = jnp.asarray(rng.gamma(2.0, 30.0, G), jnp.float32)
    del_vec = np.ones(G, np.float32)
    del_vec[sizes[0]:sizes[0] + sizes[1]] = 0.5
    del_d = jnp.asarray(del_vec)
    gen = jax.jit(lambda k, lam: jax.random.poisson(
        k, lam * jnp.ones((chunk, 1))).astype(jnp.float32))
    summ = jax.jit(lambda s: (jnp.sum(s < 3), jnp.sum(s > 3)))

    key = jax.random.PRNGKey(0)
    key, k0 = jax.random.split(key)
    ref_counts = gen(k0, gm[None, :])
    jax.block_until_ready(ref_counts)
    log("ref counts generated")
    from infercnv_tpu.ops.median import row_median

    # row_median (radix select) instead of jnp.median: XLA sort compiles
    # hang nondeterministically on the axon platform
    norm_factor = float(row_median(jnp.sum(ref_counts, axis=1)[None, :])[0])
    log(f"norm factor {norm_factor:.0f}")
    ml, mr, _ = engine.ref_stats(ref_counts[:4096], norm_factor)
    jax.block_until_ready((ml, mr))
    log("ref stats done")

    n_chunks = C_total // chunk
    t0 = time.perf_counter()
    if mode == "subclusters":
        # default analysis configuration: per-subcluster mean accumulation
        # streamed in-program, one group-mean Viterbi at the end
        n_sub = 16
        labels = np.arange(chunk) % n_sub
        onehot = np.zeros((n_sub, chunk), np.float32)
        onehot[labels, np.arange(chunk)] = 1.0
        # deletion chunks map to subclusters 8..15 so the planted CNV
        # concentrates in distinct group means
        onehot_del = np.roll(onehot, n_sub // 2, axis=0)
        oh_a, oh_d = jnp.asarray(onehot), jnp.asarray(onehot_del)
        acc = None
        for i in range(n_chunks):
            key, k = jax.random.split(key)
            lam = gm[None, :] * (del_d[None, :] if i % 2 else 1.0)
            counts = gen(k, lam)
            _resid, gs, gc = engine.subcluster_chunk(
                counts, norm_factor, ml, mr, None, oh_d if i % 2 else oh_a,
                acc=acc)
            acc = (gs, gc)
            if i % 32 == 31:
                jax.block_until_ready(acc)
                rate = (i + 1) * chunk / (time.perf_counter() - t0)
                log(f"chunk {i+1}/{n_chunks}  ({rate:.0f} cells/s incl. on-device gen)")
        states = engine.viterbi_group_means(acc[0] / acc[1][:, None])
        jax.block_until_ready(states)
        dt = time.perf_counter() - t0
        log(f"1M cells -> subcluster CNV calls in {dt:.1f}s "
            f"({C_total/dt:.0f} cells/s, incl. on-device count generation)")
        st = np.asarray(states)
        del_groups = (st[n_sub // 2:, sizes[0]:sizes[0] + sizes[1]] < 3).mean()
        neu_groups = (st[: n_sub // 2] == 3).mean()
        log(f"deletion called in planted groups: {del_groups:.3f}; "
            f"clean groups neutral: {neu_groups:.3f}")
        return

    # per-cell Viterbi mode; summaries accumulate ON DEVICE (a host sync per
    # chunk would stall the dispatch pipeline over the TPU link)
    summ_acc = jax.jit(lambda s, acc: acc + jnp.stack(
        [jnp.sum(s < 3), jnp.sum(s > 3)]).astype(jnp.float32))
    acc = jnp.zeros((2,), jnp.float32)
    for i in range(n_chunks):
        key, k = jax.random.split(key)
        lam = gm[None, :] * (del_d[None, :] if i % 2 else 1.0)
        counts = gen(k, lam)
        _resid, states = engine.full_chunk(counts, norm_factor, ml, mr)
        acc = summ_acc(states, acc)
        if i % 16 == 15:
            jax.block_until_ready(acc)
            rate = (i + 1) * chunk / (time.perf_counter() - t0)
            log(f"chunk {i+1}/{n_chunks}  ({rate:.0f} cells/s incl. on-device gen)")
    n_del, n_amp = np.asarray(acc)
    dt = time.perf_counter() - t0
    log(f"1M cells -> CNV calls in {dt:.1f}s ({C_total/dt:.0f} cells/s, "
        f"incl. on-device count generation)")
    exp = 0.5 * sizes[1] / G  # half the chunks carry the chr2 deletion
    log(f"deletion fraction {n_del/(C_total*G):.4f} (expected ~{exp:.4f}); "
        f"amp fraction {n_amp/(C_total*G):.5f}")


if __name__ == "__main__":
    main(mode=sys.argv[1] if len(sys.argv) > 1 else "cells")
