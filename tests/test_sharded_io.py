"""Per-host sharded ingestion (the 1M multi-host story, VERDICT r2 item 8).

Simulates an 8-host pod on the 8-virtual-device CPU mesh: each "host"
loads ONLY its cell slice via load_counts_shard, the shards assemble into
one cells-sharded global array, and the sharded engine consumes it —
bitwise-equal to loading everything on one host."""

import numpy as np
import pytest

from infercnv_tpu.io.sharded import (
    global_cell_array,
    host_cell_slice,
    load_counts_shard,
)


def test_host_cell_slice_partition():
    # balanced, contiguous, complete cover for awkward sizes
    for C, H in [(100, 8), (97, 8), (8, 8), (1_000_003, 16)]:
        spans = [host_cell_slice(C, h, H) for h in range(H)]
        assert spans[0][0] == 0 and spans[-1][1] == C
        for (a, b), (c, d) in zip(spans, spans[1:]):
            assert b == c
        sizes = [b - a for a, b in spans]
        assert max(sizes) - min(sizes) <= 1


def _write_h5ad(path, x_cg, fmt):
    import h5py
    import scipy.sparse as sp

    with h5py.File(path, "w") as f:
        obs = f.create_group("obs")
        obs.attrs["_index"] = "index"
        obs.create_dataset("index", data=np.array(
            [f"cell{i}".encode() for i in range(x_cg.shape[0])]))
        var = f.create_group("var")
        var.attrs["_index"] = "index"
        var.create_dataset("index", data=np.array(
            [f"g{i}".encode() for i in range(x_cg.shape[1])]))
        if fmt == "dense":
            f.create_dataset("X", data=x_cg)
        else:
            m = sp.csr_matrix(x_cg) if fmt == "csr" else sp.csc_matrix(x_cg)
            g = f.create_group("X")
            g.attrs["encoding-type"] = f"{fmt}_matrix"
            g.attrs["shape"] = np.array(x_cg.shape)
            g.create_dataset("data", data=m.data)
            g.create_dataset("indices", data=m.indices)
            g.create_dataset("indptr", data=m.indptr)


@pytest.mark.parametrize("fmt", ["dense", "csr", "csc"])
def test_load_counts_shard_h5ad(tmp_path, fmt):
    rng = np.random.default_rng(0)
    C, G = 53, 17  # awkward cell count: shards of 7 and 6
    x = (rng.random((C, G)) < 0.3).astype(np.float32) * \
        rng.integers(1, 9, (C, G)).astype(np.float32)
    path = str(tmp_path / "m.h5ad")
    _write_h5ad(path, x, fmt)
    got = np.zeros((0, G), np.float32)
    names = []
    for h in range(8):
        shard, genes, cells, (lo, hi) = load_counts_shard(path, h, 8)
        assert shard.shape == (hi - lo, G)
        assert genes == [f"g{i}" for i in range(G)]
        assert cells == [f"cell{i}" for i in range(lo, hi)]
        got = np.concatenate([got, shard])
        names += cells
    np.testing.assert_array_equal(got, x)
    assert names == [f"cell{i}" for i in range(C)]


def test_load_counts_shard_npy(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.random((40, 12)).astype(np.float32)
    path = str(tmp_path / "m.npy")
    np.save(path, x)
    shard, _g, _c, (lo, hi) = load_counts_shard(path, 3, 8)
    np.testing.assert_array_equal(shard, x[lo:hi])


def test_engine_on_host_sharded_input(tmp_path):
    """End-to-end: 8 per-host shards -> global cells-sharded array ->
    sharded engine step == single-device engine on the full matrix."""
    import jax

    from infercnv_tpu.core.genome import GeneOrder
    from infercnv_tpu.models.hmm import HMMParams
    from infercnv_tpu.parallel.engine import CnvEngine, EngineConfig, make_cell_mesh

    rng = np.random.default_rng(2)
    C, gpc, n_chr = 64, 96, 3
    G = gpc * n_chr
    counts = rng.poisson(
        rng.gamma(2.0, 30.0, G)[None, :] * np.ones((C, 1))).astype(np.float32)
    path = str(tmp_path / "counts.npy")
    np.save(path, counts)

    go = GeneOrder(names=tuple(f"g{i}" for i in range(G)),
                   chr_names=tuple(f"chr{i}" for i in range(n_chr)),
                   chr_ids=np.repeat(np.arange(n_chr), gpc).astype(np.int32),
                   start=np.arange(G), stop=np.arange(G) + 1)
    hmm = HMMParams(means=np.array([0.01, 0.5, 1.0, 1.5, 2.0, 3.0]),
                    sds=np.full(6, 0.2), t=1e-6)
    mesh = make_cell_mesh(8)
    cfg = EngineConfig(window_length=21, denoise=True)
    eng = CnvEngine(go, hmm, cfg, mesh=mesh)
    plain = CnvEngine(go, hmm, cfg)

    # each simulated host loads only its slice; shards concatenate in host
    # order (single-process fallback of global_cell_array)
    shards = [load_counts_shard(path, h, 8)[0] for h in range(8)]
    local = np.concatenate(shards)
    gx = global_cell_array(local, mesh, C)
    assert gx.sharding.spec == jax.sharding.PartitionSpec("cells", None)

    nf = float(np.median(counts.sum(axis=1)))
    ml, mr, noise = eng.ref_stats(counts[:16], nf)
    resid, states = eng.full_chunk(gx, nf, ml, mr, noise)
    ml0, mr0, noise0 = plain.ref_stats(counts[:16], nf)
    _r0, st0 = plain.full_chunk(counts, nf, ml0, mr0, noise0)
    np.testing.assert_array_equal(np.asarray(states), np.asarray(st0))


def test_load_counts_shard_10x_h5(tmp_path):
    """10x CellRanger v3 .h5 (CSC genes x cells): column slices per host."""
    import h5py
    import scipy.sparse as sp

    rng = np.random.default_rng(4)
    G, C = 25, 41
    x_gc = (rng.random((G, C)) < 0.4) * rng.integers(1, 7, (G, C))
    m = sp.csc_matrix(x_gc.astype(np.float32))
    path = str(tmp_path / "cellranger.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("matrix")
        g.create_dataset("data", data=m.data)
        g.create_dataset("indices", data=m.indices)
        g.create_dataset("indptr", data=m.indptr)
        g.create_dataset("shape", data=np.array([G, C]))
        g.create_dataset("barcodes", data=np.array(
            [f"bc{i}".encode() for i in range(C)]))
        feats = g.create_group("features")
        feats.create_dataset("name", data=np.array(
            [f"g{i}".encode() for i in range(G)]))
    got = np.zeros((0, G), np.float32)
    for h in range(8):
        shard, genes, cells, (lo, hi) = load_counts_shard(path, h, 8)
        assert genes == [f"g{i}" for i in range(G)]
        assert cells == [f"bc{i}" for i in range(lo, hi)]
        got = np.concatenate([got, shard])
    np.testing.assert_array_equal(got, x_gc.T)
