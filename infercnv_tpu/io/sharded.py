"""Per-host sharded ingestion for multi-host (pod-scale) runs.

The reference is single-process R and reads the whole counts matrix into
memory (CreateInfercnvObject, R/inferCNV.R:146-165); at 1M cells that is
a ~40 GB dense matrix and cannot land on one host of a pod slice anyway.
Multi-host JAX wants each process to materialize ONLY its slice of the
global [cells, genes] array and assemble the global sharded array from
process-local shards (jax.make_array_from_process_local_data).

This module provides exactly that: a contiguous, balanced cell-slice per
host, format-aware partial readers that never touch other hosts' rows, and
the glue that lifts local shards onto a cell-axis mesh.  See DESIGN.md
"Multi-host (1M-cell) story" for the launch recipe.

Supported formats for partial reads:
* ``.h5ad`` — dense ``/X`` row-slice, or CSR row-slice via indptr (both are
  O(shard) I/O); CSC falls back to a column-slice of genes x cells data.
* 10x CellRanger ``.h5`` — CSC with cells as columns: column slices are
  contiguous in ``data``/``indices``.
* ``.npy`` — memory-mapped row slice of a [cells, genes] array.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from infercnv_tpu.utils.logging import log_info


def host_cell_slice(num_cells: int, host_id: int, n_hosts: int) -> Tuple[int, int]:
    """Balanced contiguous [lo, hi) cell range for one host: the first
    ``num_cells % n_hosts`` hosts take one extra cell."""
    if not (0 <= host_id < n_hosts):
        raise ValueError(f"host_id {host_id} outside [0, {n_hosts})")
    base, extra = divmod(num_cells, n_hosts)
    lo = host_id * base + min(host_id, extra)
    return lo, lo + base + (1 if host_id < extra else 0)


def _h5ad_shard(path: str, lo: int, hi: int, layer: Optional[str]):
    import h5py
    import scipy.sparse as sp

    with h5py.File(path, "r") as f:
        if "matrix" in f and "X" not in f:
            # 10x CellRanger: CSC [genes x cells] -> cells are columns
            g = f["matrix"]
            indptr = g["indptr"][lo:hi + 1]
            s0, s1 = int(indptr[0]), int(indptr[-1])
            data = g["data"][s0:s1]
            indices = g["indices"][s0:s1]
            n_genes = int(g["shape"][0])
            mat = sp.csc_matrix((data, indices, indptr - s0),
                                shape=(n_genes, hi - lo))
            counts = np.asarray(mat.toarray().T, np.float32)      # [shard, G]
            from infercnv_tpu.io.loaders import _h5_string_array

            feats = g["features"]["name" if "name" in g["features"] else "id"]
            gene_names = _h5_string_array(feats)
            cells = _h5_string_array(g["barcodes"])[lo:hi]
            return counts, gene_names, cells
        from infercnv_tpu.io.loaders import _h5_index

        node = f["layers"][layer] if layer else f["X"]
        cell_names = _h5_index(f["obs"])[lo:hi]
        gene_names = _h5_index(f["var"])
        if isinstance(node, h5py.Dataset):  # dense [C, G]: direct row slice
            counts = np.asarray(node[lo:hi], np.float32)
            return counts, gene_names, cell_names
        enc = node.attrs.get("encoding-type", b"")
        if isinstance(enc, bytes):
            enc = enc.decode()
        shape = tuple(int(v) for v in node.attrs["shape"])
        if "csr" in enc:  # rows = cells: row-slice via indptr, O(shard) I/O
            indptr = node["indptr"][lo:hi + 1]
            s0, s1 = int(indptr[0]), int(indptr[-1])
            data = node["data"][s0:s1]
            indices = node["indices"][s0:s1]
            mat = sp.csr_matrix((data, indices, indptr - s0),
                                shape=(hi - lo, shape[1]))
            return np.asarray(mat.toarray(), np.float32), gene_names, cell_names
        # csc cells-x-genes: no contiguous ROW slice exists, so stream the
        # columns in blocks and keep only rows [lo, hi) — I/O still touches
        # every column's payload (CSC is the wrong layout for row shards)
        # but host MEMORY stays O(shard + block), never the full matrix
        indptr = node["indptr"][()]
        n_genes = shape[1]
        out = np.zeros((hi - lo, n_genes), np.float32)
        BLK = 256  # columns per read
        for j0 in range(0, n_genes, BLK):
            j1 = min(j0 + BLK, n_genes)
            s0, s1 = int(indptr[j0]), int(indptr[j1])
            if s0 == s1:
                continue
            data = node["data"][s0:s1]
            rows_blk = node["indices"][s0:s1]
            sub = sp.csc_matrix((data, rows_blk, indptr[j0:j1 + 1] - s0),
                                shape=(shape[0], j1 - j0))
            out[:, j0:j1] = sub[lo:hi].toarray()
        return out, gene_names, cell_names


def load_counts_shard(
    path: str,
    host_id: Optional[int] = None,
    n_hosts: Optional[int] = None,
    layer: Optional[str] = None,
) -> Tuple[np.ndarray, List[str], List[str], Tuple[int, int]]:
    """Load THIS host's cell slice of a counts file.

    Returns (counts [shard_cells, genes] float32, gene_names,
    shard_cell_names, (lo, hi)).  host_id/n_hosts default to
    jax.process_index()/jax.process_count().
    """
    import jax

    if host_id is None:
        host_id = jax.process_index()
    if n_hosts is None:
        n_hosts = jax.process_count()

    if path.endswith(".npy"):
        mm = np.load(path, mmap_mode="r")           # [cells, genes]
        lo, hi = host_cell_slice(mm.shape[0], host_id, n_hosts)
        counts = np.asarray(mm[lo:hi], np.float32)
        gene_names = [f"g{i}" for i in range(mm.shape[1])]
        cells = [f"cell_{i}" for i in range(lo, hi)]
    elif path.endswith((".h5ad", ".h5")):
        import h5py

        with h5py.File(path, "r") as f:
            if "matrix" in f and "X" not in f:
                if layer:
                    raise ValueError(
                        f"{path!r} is a 10x CellRanger .h5 (no /layers); "
                        f"layer={layer!r} cannot be honored")
                num_cells = int(f["matrix"]["shape"][1])
            else:
                # probe the SAME node _h5ad_shard will read, so the slice
                # bounds always match the matrix actually loaded
                if layer:
                    if "layers" not in f or layer not in f["layers"]:
                        raise KeyError(
                            f"{path!r}: requested layer {layer!r} not found "
                            f"in /layers")
                    node = f["layers"][layer]
                elif "X" in f:
                    node = f["X"]
                else:
                    raise KeyError(
                        f"{path!r}: no /X matrix and no layer requested; "
                        "pass layer= to select one of /layers")
                if isinstance(node, h5py.Dataset):
                    num_cells = int(node.shape[0])
                else:
                    num_cells = int(node.attrs["shape"][0])
        lo, hi = host_cell_slice(num_cells, host_id, n_hosts)
        counts, gene_names, cells = _h5ad_shard(path, lo, hi, layer)
    else:
        raise ValueError(
            f"sharded loading supports .npy/.h5ad/.h5, got {path!r} "
            "(tsv at pod scale would serialize the whole file per host)")
    log_info(f"host {host_id}/{n_hosts}: loaded cell shard [{lo}, {hi}) "
             f"({counts.shape[0]} x {counts.shape[1]})")
    return counts, gene_names, cells, (lo, hi)


def global_cell_array(local_shard: np.ndarray, mesh, num_cells_global: int):
    """Lift this process's [local_cells, ...] shard into the global
    cells-sharded jax.Array on ``mesh``.

    Single-process meshes (including the 8-virtual-device CPU dryrun) fall
    back to device_put with the cell-axis sharding; multi-process runs use
    jax.make_array_from_process_local_data so no host ever materializes the
    global matrix."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P("cells", *([None] * (local_shard.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(local_shard), sharding)
    global_shape = (num_cells_global,) + tuple(local_shard.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, local_shard, global_shape)
