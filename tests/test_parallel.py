"""Sharding tests: the cell-sharded engine must produce bitwise-identical
results to the unsharded path on the 8-device CPU mesh (SURVEY §4: 1-chip vs
N-chip equality of merged results)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from infercnv_tpu.core.genome import GeneOrder
from infercnv_tpu.models.hmm import HMMParams
from infercnv_tpu.parallel.engine import CnvEngine, EngineConfig, make_cell_mesh


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(3)
    n_chr, gpc = 3, 96
    G = n_chr * gpc
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=tuple(f"chr{i+1}" for i in range(n_chr)),
        chr_ids=np.repeat(np.arange(n_chr), gpc).astype(np.int32),
        start=np.arange(G), stop=np.arange(G),
    )
    hmm = HMMParams(
        means=np.array([0.01, 0.5, 1.0, 1.5, 2.0, 3.0]),
        sds=np.array([0.15, 0.18, 0.12, 0.2, 0.22, 0.3]),
        t=1e-6,
    )
    counts = rng.poisson(
        rng.gamma(2.0, 30.0, G)[None, :] * np.ones((64, 1))).astype(np.float32)
    # plant CNVs in the non-reference cells
    counts[32:, gpc:2 * gpc] = np.maximum(counts[32:, gpc:2 * gpc] * 0.5, 0)
    return go, hmm, counts


def test_sharded_equals_unsharded(problem):
    go, hmm, counts = problem
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    norm_factor = float(np.median(counts.sum(axis=1)))

    plain = CnvEngine(go, hmm, EngineConfig(window_length=11))
    ml, mr, bounds = plain.ref_stats(counts[:16], norm_factor)
    r0, s0 = plain.full_chunk(counts, norm_factor, ml, mr)

    mesh = make_cell_mesh(8)
    sharded = CnvEngine(go, hmm, EngineConfig(window_length=11), mesh=mesh)
    ml2, mr2, bounds2 = sharded.ref_stats(counts[:16], norm_factor)
    counts_sh = jax.device_put(jnp.asarray(counts),
                               NamedSharding(mesh, P("cells", None)))
    r1, s1 = sharded.full_chunk(counts_sh, norm_factor, ml2, mr2)

    np.testing.assert_allclose(np.asarray(ml), np.asarray(ml2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


def test_states_detect_planted_cnv(problem):
    go, hmm, counts = problem
    norm_factor = float(np.median(counts.sum(axis=1)))
    engine = CnvEngine(go, hmm, EngineConfig(window_length=11))
    ml, mr, _ = engine.ref_stats(counts[:16], norm_factor)
    _, states = engine.full_chunk(counts, norm_factor, ml, mr)
    states = np.asarray(states)
    # planted 0.5x deletion on chr2 of cells 32+
    assert (states[32:, 96:192] < 3).mean() > 0.5
    assert (states[:16] == 3).mean() > 0.9


def test_sharded_equals_unsharded_realistic_genome():
    """Full-scale sharding equality: 22 chromosomes / ~8.4k genes / 1024
    cells (the bundled example's genome shape), default configuration
    (2 ref groups, denoise, subcluster accumulation) — sharded over 8
    devices vs single-device, bitwise states and matching group sums."""
    rng = np.random.default_rng(5)
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
    C = 1024
    lam = rng.gamma(2.0, 30.0, G)[None, :] * np.ones((C, 1))
    chr2 = go.chr_gene_indices("chr2")
    chr5 = go.chr_gene_indices("chr5")
    lam[C // 2:, chr2] *= 0.5   # planted deletion in tumor half
    lam[C // 2:, chr5] *= 2.0   # planted amplification
    counts = rng.poisson(lam).astype(np.float32)
    norm_factor = float(np.median(counts.sum(axis=1)))
    ref_idx = np.arange(C // 2)
    onehot_ref = np.zeros((2, ref_idx.size), np.float32)
    onehot_ref[0, : ref_idx.size // 2] = 1.0
    onehot_ref[1, ref_idx.size // 2:] = 1.0
    onehot = np.zeros((2, C), np.float32)
    onehot[0, :C // 2] = 1.0
    onehot[1, C // 2:] = 1.0
    cfg = EngineConfig(denoise=True)

    plain = CnvEngine(go, hmm, cfg)
    ml, mr, noise = plain.ref_stats(counts[ref_idx], norm_factor, onehot_ref)
    r0, s0 = plain.full_chunk(counts, norm_factor, ml, mr, noise)
    _, g0, c0 = plain.subcluster_chunk(counts, norm_factor, ml, mr, noise, onehot)

    mesh = make_cell_mesh(8)
    sharded = CnvEngine(go, hmm, cfg, mesh=mesh)
    counts_sh = jax.device_put(jnp.asarray(counts),
                               NamedSharding(mesh, P("cells", None)))
    r1, s1 = sharded.full_chunk(counts_sh, norm_factor, ml, mr, noise)
    _, g1, c1 = sharded.subcluster_chunk(counts_sh, norm_factor, ml, mr,
                                         noise, onehot)

    s0, s1 = np.asarray(s0), np.asarray(s1)
    np.testing.assert_array_equal(s0, s1)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), rtol=0, atol=0)
    # non-trivial biology: the planted CNVs are called
    assert (s1[C // 2:][:, chr2] < 3).mean() > 0.7
    assert (s1[C // 2:][:, chr5] > 3).mean() > 0.7
    assert (s1[:C // 2] == 3).mean() > 0.9


def test_sharded_group_stats_match_numpy(rng):
    from infercnv_tpu.ops.transforms import group_onehot
    from infercnv_tpu.parallel.stats import (
        put_cell_sharded,
        sharded_group_gene_stats,
        sharded_median,
        sharded_quantile,
    )

    mesh = make_cell_mesh(8)
    C, G = 64, 40
    x = rng.normal(1, 0.5, (C, G)).astype(np.float32)
    groups = [np.arange(0, 10), np.arange(10, 25), np.arange(40, 64)]
    M = group_onehot(groups, C)
    means, sds = sharded_group_gene_stats(
        put_cell_sharded(x, mesh),
        jax.device_put(jnp.asarray(M), NamedSharding(mesh, P(None, "cells"))),
        mesh)
    for k, g in enumerate(groups):
        np.testing.assert_allclose(np.asarray(means)[k], x[g].mean(0), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sds)[k], x[g].std(0, ddof=1), rtol=1e-4, atol=1e-5)

    v = rng.normal(3, 2, C).astype(np.float32)
    vs = put_cell_sharded(v, mesh)
    assert float(sharded_median(vs, mesh)) == np.median(v)
    np.testing.assert_allclose(float(sharded_quantile(vs, 0.01, mesh)),
                               np.quantile(v, 0.01), rtol=1e-5)
    np.testing.assert_allclose(float(sharded_quantile(vs, 0.99, mesh)),
                               np.quantile(v, 0.99), rtol=1e-5)


def test_binpacked_viterbi_matches_per_chromosome():
    """Chromosome bin-packing (unequal lengths -> several chrs share one
    padded sequence) must not change any state call vs the per-chromosome
    reference path, including a 1-gene chromosome (forced neutral)."""
    from infercnv_tpu.models.hmm import viterbi_per_group
    from infercnv_tpu.parallel.engine import _pack_indices

    rng = np.random.default_rng(11)
    lens = [100, 40, 30, 20, 1]
    G = sum(lens)
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=tuple(f"chr{i+1}" for i in range(len(lens))),
        chr_ids=np.repeat(np.arange(len(lens)), lens).astype(np.int32),
        start=np.arange(G), stop=np.arange(G),
    )
    gather, valid, boundaries, Lmax = _pack_indices(go)
    assert gather.shape[0] < len(lens)  # packing actually happened
    hmm = HMMParams(
        means=np.array([0.01, 0.5, 1.0, 1.5, 2.0, 3.0]),
        sds=np.array([0.15, 0.18, 0.12, 0.2, 0.22, 0.3]),
        t=1e-6,
    )
    resid = rng.normal(1.0, 0.2, (16, G)).astype(np.float32)
    resid[8:, 100:140] += 0.8   # planted CNV on chr2
    resid[4:8, 140:170] -= 0.5  # planted loss on chr3

    engine = CnvEngine(go, hmm, EngineConfig(), use_pallas=False)
    got = np.asarray(engine._viterbi(jnp.asarray(resid)))
    exp = viterbi_per_group(resid, go, hmm)
    np.testing.assert_array_equal(got, exp)


def test_binpacked_viterbi_pallas_matches_per_chromosome():
    """Same bin-packing equivalence through the PALLAS kernel (interpreted
    off-TPU): chromosome-join restarts must hold on the production TPU path,
    not just the XLA fallback."""
    from infercnv_tpu.models.hmm import viterbi_per_group

    rng = np.random.default_rng(11)
    lens = [100, 40, 30, 20, 1]
    G = sum(lens)
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=tuple(f"chr{i+1}" for i in range(len(lens))),
        chr_ids=np.repeat(np.arange(len(lens)), lens).astype(np.int32),
        start=np.arange(G), stop=np.arange(G),
    )
    hmm = HMMParams(
        means=np.array([0.01, 0.5, 1.0, 1.5, 2.0, 3.0]),
        sds=np.array([0.15, 0.18, 0.12, 0.2, 0.22, 0.3]),
        t=1e-6,
    )
    resid = rng.normal(1.0, 0.2, (16, G)).astype(np.float32)
    resid[8:, 95:140] += 0.8   # CNV straddling the chr1/chr2 join in a bin
    resid[4:8, 140:170] -= 0.5

    engine = CnvEngine(go, hmm, EngineConfig(), use_pallas=True)
    assert engine._pallas_interpret  # running off-TPU -> interpreted kernel
    got = np.asarray(engine._viterbi(jnp.asarray(resid)))
    exp = viterbi_per_group(resid, go, hmm)
    np.testing.assert_array_equal(got, exp)


def test_ref_stats_streamed_matches_oneshot():
    """The chunked three-pass reference statistics (used when the
    reference block exceeds HBM at 1M cells) agree with the one-shot
    program to f32 rounding."""
    import numpy as np

    from infercnv_tpu.core.genome import GeneOrder
    from infercnv_tpu.models.hmm import HMMParams
    from infercnv_tpu.parallel.engine import CnvEngine, EngineConfig

    G = 600
    go = GeneOrder(names=tuple(f"g{i}" for i in range(G)),
                   chr_names=("chr1", "chr2", "chr3"),
                   chr_ids=np.repeat(np.arange(3), G // 3).astype(np.int32),
                   start=np.arange(G), stop=np.arange(G) + 1)
    hmm = HMMParams(means=np.arange(1.0, 7.0) / 3.0, sds=np.full(6, 0.1),
                    t=1e-6)
    rng = np.random.default_rng(3)
    counts = rng.poisson(rng.gamma(2.0, 20.0, G)[None, :],
                         (700, G)).astype(np.float32)
    onehot = np.zeros((2, 700), np.float32)
    onehot[0, :350] = 1
    onehot[1, 350:] = 1
    eng = CnvEngine(go, hmm, EngineConfig(window_length=31, denoise=False))
    nf = float(np.median(counts.sum(axis=1)))
    ml_a, mr_a, nb_a = eng.ref_stats(counts, nf, onehot)
    ml_b, mr_b, nb_b = eng._ref_stats_streamed(counts, nf, onehot, chunk=256)
    np.testing.assert_allclose(np.asarray(ml_b), np.asarray(ml_a),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mr_b), np.asarray(mr_a),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nb_b), np.asarray(nb_a),
                               rtol=1e-4, atol=1e-5)
    # u16 counts stream identically (the passes cast in-program)
    ml_c, mr_c, _ = eng._ref_stats_streamed(counts.astype(np.uint16), nf,
                                            onehot, chunk=256)
    np.testing.assert_allclose(np.asarray(ml_c), np.asarray(ml_b),
                               rtol=1e-6, atol=1e-6)
