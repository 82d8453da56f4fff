"""REAL multi-host execution: two coordinated OS processes under
jax.distributed (localhost CPU, 4 virtual devices each, gloo collectives)
load per-host shards via io/sharded.py, run the sharded median, the group
psum stats, and the fused engine across the process boundary, and must be
BITWISE equal to the single-process result.

This is the DESIGN.md "Multi-host (1M-cell) story" executed as actual
separate processes — the reference (single-process R) has no counterpart
(SURVEY §2.3); BASELINE config 5 requires exactly this path.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _make_data(tmp_path, C=256, G=384, n_ref=64, seed=0):
    rng = np.random.default_rng(seed)
    n_chr = 3
    sizes = [G // n_chr] * n_chr
    sizes[0] += G - sum(sizes)
    chr_ids = np.repeat(np.arange(n_chr), sizes).astype(np.int32)
    gene_means = rng.gamma(2.0, 8.0, G)
    lam = np.broadcast_to(gene_means, (C, G)).copy()
    lam[n_ref:, :G // 3] *= 0.5          # planted deletion in tumors
    counts = rng.poisson(lam).astype(np.float32)
    np.save(os.path.join(tmp_path, "counts.npy"), counts)
    meta = {
        "C": C, "G": G, "n_ref": n_ref, "window": 31,
        "chr_names": [f"chr{i + 1}" for i in range(n_chr)],
        "chr_ids": chr_ids.tolist(),
        "start": (np.arange(G) * 1000).tolist(),
        "stop": (np.arange(G) * 1000 + 500).tolist(),
    }
    with open(os.path.join(tmp_path, "meta.json"), "w") as f:
        json.dump(meta, f)
    return counts, meta


def _build_run_object(data_dir, meta):
    """InferCNV object for the run()-level case (shared by the worker and
    the single-process reference so both paths see identical inputs)."""
    import numpy as np

    from infercnv_tpu.core.object import create_infercnv_object

    counts = np.load(os.path.join(data_dir, "counts.npy"))  # [C, G]
    C, G, n_ref = meta["C"], meta["G"], meta["n_ref"]
    gene_names = [f"g{i}" for i in range(G)]
    cell_names = [f"c{i}" for i in range(C)]
    ann = {c: ("normal" if i < n_ref else "tumor")
           for i, c in enumerate(cell_names)}
    table = {g: (meta["chr_names"][meta["chr_ids"][i]], meta["start"][i],
                 meta["stop"][i]) for i, g in enumerate(gene_names)}
    return create_infercnv_object(
        counts_matrix=counts.T, gene_names=gene_names, cell_names=cell_names,
        annotations=ann, gene_order_table=table,
        chr_file_order=meta["chr_names"], ref_group_names=["normal"],
        chr_exclude=(), min_max_counts_per_cell=(1, np.inf))


def _single_process_reference(counts, meta):
    """Same computation on THIS process's devices (no mesh)."""
    from infercnv_tpu.core.genome import GeneOrder
    from infercnv_tpu.models.hmm import HMMParams
    from infercnv_tpu.parallel.engine import CnvEngine, EngineConfig

    C, G, n_ref = meta["C"], meta["G"], meta["n_ref"]
    go = GeneOrder(
        names=tuple(f"g{i}" for i in range(G)),
        chr_names=tuple(meta["chr_names"]),
        chr_ids=np.asarray(meta["chr_ids"], np.int32),
        start=np.asarray(meta["start"]), stop=np.asarray(meta["stop"]),
    )
    params = HMMParams(means=np.arange(1.0, 7.0) / 3.0, sds=np.full(6, 0.1),
                       t=1e-6)
    engine = CnvEngine(go, params, EngineConfig(window_length=meta["window"],
                                                denoise=False), mesh=None)
    norm_factor = float(np.median(counts.sum(axis=1)))
    ml, mr, nb = engine.ref_stats(counts[:n_ref], norm_factor)
    resid, states = engine.full_chunk(counts, norm_factor, ml, mr, nb)
    ref = counts[:n_ref]
    gmean = ref.mean(axis=0, dtype=np.float64).astype(np.float32)
    gsd = ref.std(axis=0, ddof=1, dtype=np.float64).astype(np.float32)
    return (np.asarray(resid), np.asarray(states), norm_factor, gmean, gsd)


def test_two_process_multihost_bitwise_equal(tmp_path):
    data_dir = str(tmp_path)
    counts, meta = _make_data(data_dir)
    port = _free_port()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), data_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    # stitch the per-host shards back together
    C, G = meta["C"], meta["G"]
    resid = np.full((C, G), np.nan, np.float32)
    states = np.zeros((C, G), np.int32)
    nf = []
    gm = []
    for pid in range(2):
        z = np.load(os.path.join(data_dir, f"out_host{pid}.npz"))
        r0 = int(z["resid_start"])
        resid[r0:r0 + z["resid"].shape[0]] = z["resid"]
        s0 = int(z["states_start"])
        states[s0:s0 + z["states"].shape[0]] = z["states"]
        nf.append(float(z["norm_factor"]))
        gm.append((np.asarray(z["gmeans"]), np.asarray(z["gsds"])))
    assert not np.isnan(resid).any(), "hosts did not cover all cell rows"

    exp_resid, exp_states, exp_nf, exp_gmean, exp_gsd = \
        _single_process_reference(counts, meta)

    # both hosts agree on the replicated statistics
    assert nf[0] == nf[1] == exp_nf
    np.testing.assert_array_equal(gm[0][0], gm[1][0])
    # psum group stats match the float64 host reference closely
    np.testing.assert_allclose(gm[0][0][0], exp_gmean, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gm[0][1][0], exp_gsd, rtol=1e-3, atol=1e-3)

    # the CNV state calls are BITWISE equal to single-process; the float32
    # residual agrees to ~1 ulp (XLA picks shape-dependent vectorization for
    # the 32-row shard vs the 256-row single-device program, which permutes
    # the within-row reduction order)
    np.testing.assert_array_equal(states, exp_states)
    np.testing.assert_allclose(resid, exp_resid, rtol=0, atol=1e-6)

    # signal sanity: planted deletion called in tumors, refs neutral
    assert (exp_states[meta["n_ref"]:, : G // 3] < 3).mean() > 0.7
    assert (exp_states[: meta["n_ref"]] == 3).mean() > 0.95


def test_two_process_full_run_identical(tmp_path):
    """The COMPLETE run() (leiden subclusters, i6 HMM, denoise, region
    reports) as two coordinated jax.distributed processes over one global
    8-device mesh: final expression, HMM states, and the region report
    written by host 0 must equal the single-process run bit-for-bit
    (states/reports) / to float32 ulp (expression).  VERDICT r4 item 6."""
    data_dir = str(tmp_path)
    counts, meta = _make_data(data_dir)
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), data_dir,
             "run"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    # single-process reference with the identical config
    from infercnv_tpu.runner.pipeline import run

    obj = _build_run_object(data_dir, meta)
    ref_out = os.path.join(data_dir, "run_single")
    res = run(obj, out_dir=ref_out, analysis_mode="subclusters",
              tumor_subcluster_partition_method="leiden",
              HMM=True, HMM_type="i6", denoise=True,
              window_length=meta["window"],
              no_plot=True, save_rds=False, save_final_rds=False,
              no_prelim_plot=True, BayesMaxPNormal=0)

    z0 = np.load(os.path.join(data_dir, "run_out_host0.npz"))
    z1 = np.load(os.path.join(data_dir, "run_out_host1.npz"))
    # both hosts computed the same global results
    np.testing.assert_array_equal(z0["states"], z1["states"])
    np.testing.assert_array_equal(z0["expr"], z1["expr"])
    # ... equal to the single-process run
    np.testing.assert_array_equal(z0["states"], np.asarray(res.hmm_states))
    np.testing.assert_allclose(z0["expr"], np.asarray(res.infercnv_obj.expr),
                               rtol=0, atol=1e-6)
    # host 0 wrote the user-facing region report; identical bytes
    import glob

    ref_regions = sorted(glob.glob(os.path.join(ref_out, "*pred_cnv_regions.dat")))
    assert ref_regions, "single-process run wrote no region report"
    for rf in ref_regions:
        hf = os.path.join(data_dir, "run_host0", os.path.basename(rf))
        assert os.path.exists(hf), hf
        assert open(hf, "rb").read() == open(rf, "rb").read(), rf
