#!/usr/bin/env python
"""Per-kernel roofline profile on the real chip (BENCHMARKS.md "kernel
profile"; VERDICT r3 item 7).

Measures, on the default-config chunk shape, each stage of the engine's
hot pass with FLOP/s and HBM-traffic estimates vs the v5e roofline
(f32 MXU ~49 TFLOP/s via 6-pass emulation at HIGHEST, bf16 ~197 TFLOP/s,
HBM ~819 GB/s):

* banded smooth, Pallas K=256: f32-HIGHEST vs bf16-multiply/f32-accumulate
* row median (Pallas radix select)
* full fused residual (transform_chunk)
* residual+Viterbi (full_chunk)

Usage: python benchmarks/kernel_profile.py [--cells 8192] [--genes 8448]
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def timeit(fn, x, *args, iters=20, **kw):
    """Per-call device time via a dependence chain INSIDE one compiled
    program (lax.fori_loop): the remote-relay dispatch latency is paid once
    per measurement, not per iteration, and the data dependence (a full
    reduction of each output fed back into the next input, so XLA cannot
    dead-code-eliminate any part of the kernel) forces sequential
    execution.  The feedback adds one [C, G] read per iteration — noted in
    the roofline numbers."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def body(i, xx):
        r = fn(xx, *args, **kw)
        parts = r if isinstance(r, (tuple, list)) else (r,)
        # consume EVERY output so XLA cannot dead-code-eliminate any stage
        fb = sum(jnp.sum(p).astype(jnp.float32) for p in parts)
        return xx + (0.0 * fb).astype(xx.dtype)

    chained = jax.jit(lambda x0: lax.fori_loop(0, iters, body, x0))
    jax.block_until_ready(chained(x))  # warmup/compile
    t0 = time.perf_counter()
    jax.block_until_ready(chained(x))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=8192)
    ap.add_argument("--genes", type=int, default=8448)
    ap.add_argument("--window", type=int, default=101)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from infercnv_tpu.core.genome import GeneOrder
    from infercnv_tpu.models.hmm import HMMParams
    from infercnv_tpu.ops.layout import smoothing_operator
    from infercnv_tpu.ops.median import row_median_pallas
    from infercnv_tpu.ops.smoothing import _apply_banded_pallas_k256
    from infercnv_tpu.parallel.engine import CnvEngine, EngineConfig

    C, G = args.cells, args.genes
    n_chr = 22
    sizes = np.full(n_chr, G // n_chr)
    sizes[0] += G - sizes.sum()
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=tuple(f"chr{i+1}" for i in range(n_chr)),
        chr_ids=np.repeat(np.arange(n_chr), sizes).astype(np.int32),
        start=np.arange(G) * 1000, stop=np.arange(G) * 1000 + 500,
    )
    rng = np.random.default_rng(0)
    counts_np = rng.poisson(rng.gamma(2.0, 8.0, G)[None, :] *
                            np.ones((C, 1))).astype(np.float32)
    # device-resident inputs: the remote-relay link must not be part of the
    # per-kernel timing (it is measured separately by the e2e benchmarks)
    counts = jax.device_put(counts_np)
    x = jax.device_put(rng.normal(0, 0.3, (C, G)).astype(np.float32))

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}, chunk {C} x {G}")

    op = smoothing_operator(go, args.window, "pyramidinal")
    w = jnp.asarray(op.shifted_blocks())
    flops_smooth = 2.0 * C * op.n_tiles * 128 * 256  # K=256 contraction
    bytes_smooth = 4.0 * C * G * 2 + w.size * 4      # x in + out + weights

    for dtype in ("float32", "bfloat16"):
        dt = timeit(_apply_banded_pallas_k256, x, w, op.n_tiles,
                    op.side_tiles, op.num_genes, False, matmul_dtype=dtype)
        print(f'{{"stage": "smooth_{dtype}", "ms": {dt*1e3:.2f}, '
              f'"tflops": {flops_smooth/dt/1e12:.1f}, '
              f'"hbm_gbps": {bytes_smooth/dt/1e9:.0f}}}')

    dt = timeit(row_median_pallas, x)
    print(f'{{"stage": "row_median", "ms": {dt*1e3:.2f}, '
          f'"hbm_gbps": {4.0*C*G/dt/1e9:.0f}}}')

    hmm = HMMParams(means=np.array([0.01, 0.5, 1.0, 1.5, 2.0, 3.0]),
                    sds=np.full(6, 0.15), t=1e-6)
    for dtype in ("float32", "bfloat16"):
        engine = CnvEngine(go, hmm, EngineConfig(window_length=args.window,
                                                 denoise=False,
                                                 matmul_dtype=dtype))
        nf = float(np.median(counts_np.sum(axis=1)))
        ml, mr, nb = engine.ref_stats(counts_np[:256], nf)
        dt = timeit(engine.transform_chunk, counts, nf, ml, mr)
        print(f'{{"stage": "residual_chunk_{dtype}", "ms": {dt*1e3:.2f}, '
              f'"cells_per_s": {C/dt:.0f}}}')
        dt = timeit(engine.full_chunk, counts, nf, ml, mr, nb)
        print(f'{{"stage": "residual+viterbi_{dtype}", "ms": {dt*1e3:.2f}, '
              f'"cells_per_s": {C/dt:.0f}}}')


if __name__ == "__main__":
    main()
