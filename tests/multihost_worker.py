"""Worker program for the REAL multi-host test (tests/test_multihost.py).

Each invocation is one coordinated process of an N-process jax.distributed
job on localhost CPU (4 virtual devices per process, gloo collectives):
the DESIGN.md "Multi-host (1M-cell) story" executed as actual separate
processes rather than a single-process simulation.

Not a pytest module — launched via subprocess by test_multihost.py.

Usage: python multihost_worker.py <pid> <nprocs> <port> <data_dir> [mode]

mode 'engine' (default): the streamed engine + sharded stats path.
mode 'run': the COMPLETE product pipeline — run() with leiden
subclustering, i6 HMM, denoise and region reports executed over the
2-process global mesh (VERDICT r4 item 6); host 0 writes plots/reports,
other hosts run with no_plot into their own scratch out_dir.
"""

import json
import os
import sys


def main() -> None:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    data_dir = sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "engine"

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()
    import jax

    # the axon sitecustomize imports jax at interpreter start, so the env
    # var route (JAX_PLATFORMS) is already latched — use config.update
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.default_backend() == "cpu"

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from infercnv_tpu.core.genome import GeneOrder
    from infercnv_tpu.io.sharded import global_cell_array, load_counts_shard
    from infercnv_tpu.models.hmm import HMMParams
    from infercnv_tpu.parallel.engine import CnvEngine, EngineConfig
    from infercnv_tpu.parallel.stats import (
        sharded_group_gene_stats,
        sharded_median,
    )

    with open(os.path.join(data_dir, "meta.json")) as f:
        meta = json.load(f)
    C, G = meta["C"], meta["G"]
    n_ref = meta["n_ref"]

    if mode == "run":
        _run_full_pipeline(pid, data_dir, meta)
        return

    # 1. per-host shard ingestion (host_id defaults to jax.process_index())
    local, _genes, _cells, (lo, hi) = load_counts_shard(
        os.path.join(data_dir, "counts.npy"))
    assert local.shape[0] == hi - lo

    mesh = Mesh(np.array(jax.devices()), ("cells",))
    counts = global_cell_array(local, mesh, C)        # global [C, G], sharded

    # 2. sharded exact median of library sizes (depth-norm factor) — the
    # psums cross the process boundary
    libsizes_local = local.sum(axis=1).astype(np.float32)
    lib = global_cell_array(libsizes_local, mesh, C)
    norm_factor = float(sharded_median(lib, mesh))

    # 3. group psum stats across hosts (per-gene reference means/sds)
    onehot_local = np.zeros((1, local.shape[0]), np.float32)
    span = np.arange(lo, hi)
    onehot_local[0, (span < n_ref)] = 1.0
    onehot = global_cell_array(onehot_local.T, mesh, C).T  # [1, C] cell-sharded
    gmeans, gsds = sharded_group_gene_stats(counts, onehot, mesh)
    gmeans, gsds = np.asarray(gmeans), np.asarray(gsds)

    # 4. the fused engine over the multi-process mesh
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=tuple(meta["chr_names"]),
        chr_ids=np.asarray(meta["chr_ids"], np.int32),
        start=np.asarray(meta["start"]), stop=np.asarray(meta["stop"]),
    )
    params = HMMParams(means=np.arange(1.0, 7.0) / 3.0, sds=np.full(6, 0.1),
                       t=1e-6)
    engine = CnvEngine(go, params, EngineConfig(window_length=meta["window"],
                                                denoise=False), mesh=mesh)
    # reference rows replicated to every host via an all-gather-producing jit
    ref_global = jax.jit(lambda x: x[:n_ref],
                         out_shardings=NamedSharding(mesh, P()))(counts)
    ml, mr, nb = engine.ref_stats(np.asarray(ref_global), norm_factor)
    resid, states = engine.full_chunk(counts, norm_factor, ml, mr, nb)

    # each host persists ITS addressable rows of the global results
    def local_rows(garr):
        shards = sorted(garr.addressable_shards, key=lambda s: s.index[0].start)
        rows = np.concatenate([np.asarray(s.data) for s in shards])
        starts = [s.index[0].start for s in shards]
        return rows, min(starts)

    resid_rows, r0 = local_rows(resid)
    states_rows, s0 = local_rows(states)
    np.savez(os.path.join(data_dir, f"out_host{pid}.npz"),
             resid=resid_rows, resid_start=r0,
             states=states_rows, states_start=s0,
             norm_factor=norm_factor, gmeans=gmeans, gsds=gsds)
    print(f"host {pid}: OK rows [{r0}, {r0 + resid_rows.shape[0]})", flush=True)


def _run_full_pipeline(pid: int, data_dir: str, meta: dict) -> None:
    """The complete run() across the 2-process mesh.

    Every host holds the full (small) counts matrix for the host-side
    steps — the realistic large-scale layout keeps obj.expr memory-mapped;
    per-host SHARDED ingestion is exercised by the 'engine' mode — while
    all compiled cell-axis steps (engine transform, HMM Viterbi, sharded
    median) run over the global mesh with gloo collectives."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tests.test_multihost import _build_run_object

    from infercnv_tpu.runner.pipeline import run

    mesh = Mesh(np.array(jax.devices()), ("cells",))
    obj = _build_run_object(data_dir, meta)
    out_dir = os.path.join(data_dir, f"run_host{pid}")
    res = run(obj, out_dir=out_dir, mesh=mesh,
              analysis_mode="subclusters",
              tumor_subcluster_partition_method="leiden",
              HMM=True, HMM_type="i6", denoise=True,
              window_length=meta["window"],
              no_plot=(pid != 0), save_rds=False, save_final_rds=False,
              no_prelim_plot=True, BayesMaxPNormal=0)
    np.savez(os.path.join(data_dir, f"run_out_host{pid}.npz"),
             expr=np.asarray(res.infercnv_obj.expr),
             states=np.asarray(res.hmm_states))
    print(f"host {pid}: run() OK", flush=True)


if __name__ == "__main__":
    main()
