"""Bare-ENGINE 100k-cell streaming benchmark with pre-assigned subcluster
labels — measures compute-path throughput only.  The PRODUCT-level
benchmark (counts -> Leiden -> HMM -> Bayes -> plots through run()) is
benchmarks/scale100k_run.py; see BENCHMARKS.md round 3."""

import os, sys, time
import numpy as np, jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from infercnv_tpu.core.genome import GeneOrder
from infercnv_tpu.models.hmm import HMMParams
from infercnv_tpu.parallel.engine import CnvEngine, EngineConfig

def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

n_chr = 22
sizes = np.linspace(800, 120, n_chr).astype(int); sizes = (sizes/sizes.sum()*8448).astype(int); sizes[0] += 8448 - sizes.sum()
G = int(sizes.sum())
go = GeneOrder(names=tuple(f"g{i}" for i in range(G)), chr_names=tuple(f"chr{i+1}" for i in range(n_chr)),
               chr_ids=np.repeat(np.arange(n_chr), sizes).astype(np.int32), start=np.arange(G), stop=np.arange(G))
hmm = HMMParams(means=np.array([0.135,0.631,1.0,1.346,1.702,2.237]), sds=np.array([0.221,0.252,0.211,0.288,0.341,0.457]), t=1e-6)
engine = CnvEngine(go, hmm, EngineConfig())
log("engine built")

C_total, chunk = 102400, 8192
n_chunks = C_total // chunk
rng = np.random.default_rng(0)
gm = jnp.asarray(rng.gamma(2.0, 30.0, G), jnp.float32)
del_vec = np.ones(G, np.float32); del_vec[sizes[0]:sizes[0]+sizes[1]] = 0.5
del_d = jnp.asarray(del_vec)
key = jax.random.PRNGKey(0)
gen = jax.jit(lambda k, lam: jax.random.poisson(k, lam * jnp.ones((chunk, 1))).astype(jnp.float32))
summ = jax.jit(lambda s: (jnp.sum(s < 3), jnp.sum(s > 3)))

dev_chunks = []
t0 = time.perf_counter()
for i in range(n_chunks):
    key, k = jax.random.split(key)
    lam = gm[None, :] * (del_d[None, :] if i >= n_chunks//2 else 1.0)
    c = gen(k, lam)
    jax.block_until_ready(c)
    log(f"chunk {i} generated")
    dev_chunks.append(c)
log(f"staged {n_chunks} chunks in {time.perf_counter()-t0:.1f}s")

t_start = time.perf_counter()
libs = jnp.concatenate([jnp.sum(c, axis=1) for c in dev_chunks])
norm_factor = float(jnp.median(libs))
log(f"norm factor {norm_factor:.0f}")
ml, mr, bounds = engine.ref_stats(dev_chunks[0][:4096], norm_factor)
jax.block_until_ready((ml, mr))
t_stats = time.perf_counter()
log(f"ref stats {t_stats-t_start:.1f}s")
n_del = 0; n_amp = 0
for i, c in enumerate(dev_chunks):
    resid, states = engine.full_chunk(c, norm_factor, ml, mr)
    d, a = summ(states)
    n_del += int(d); n_amp += int(a)
    log(f"chunk {i} done")
t_end = time.perf_counter()
log(f"ref stats: {t_stats-t_start:.1f}s  stream: {t_end-t_stats:.1f}s")
log(f"TOTAL wall-clock to CNV calls at 100k cells: {t_end-t_start:.1f}s ({C_total/(t_end-t_start):.0f} cells/s)")
exp = 0.5*sizes[1]/G
log(f"deletion-called fraction: {n_del/(C_total*G):.4f} (expected ~{exp:.4f}), amp fraction: {n_amp/(C_total*G):.5f}")
