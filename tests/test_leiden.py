"""Leiden tests: both the native C++ and pure-Python paths must recover
planted community structure; the auto-resolution formula must match the
reference's magic constant."""

import numpy as np
import pytest
from scipy import sparse

from infercnv_tpu.subcluster.leiden import auto_resolution, knn_graph, leiden, snn_graph


def planted_graph(rng, sizes=(40, 35, 25), p_in=0.4, p_out=0.01):
    n = sum(sizes)
    labels = np.repeat(np.arange(len(sizes)), sizes)
    rows, cols = [], []
    for i in range(n):
        for j in range(i + 1, n):
            p = p_in if labels[i] == labels[j] else p_out
            if rng.random() < p:
                rows += [i, j]
                cols += [j, i]
    A = sparse.csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    return A, labels


def _agreement(a, b):
    """Adjusted-Rand-free check: fraction of pairs classified consistently."""
    a, b = np.asarray(a), np.asarray(b)
    same_a = a[:, None] == a[None, :]
    same_b = b[:, None] == b[None, :]
    return (same_a == same_b).mean()


@pytest.mark.parametrize("objective", ["CPM", "modularity"])
def test_leiden_recovers_planted_communities(objective, rng):
    A, labels = planted_graph(rng)
    res = 0.05 if objective == "CPM" else 1.0
    memb = leiden(A, res, objective=objective, seed=7)
    assert _agreement(memb, labels) > 0.95


def test_native_and_python_agree_on_structure(rng, monkeypatch):
    A, labels = planted_graph(rng)
    memb_native = leiden(A, 0.05, objective="CPM", seed=7)
    monkeypatch.setenv("INFERCNV_TPU_NO_NATIVE", "1")
    import infercnv_tpu.native as native_mod

    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_tried", False)
    memb_py = leiden(A, 0.05, objective="CPM", seed=7)
    # same partitions up to label permutation on well-separated data
    assert _agreement(memb_native, memb_py) > 0.95
    assert _agreement(memb_py, labels) > 0.95


def test_native_lib_builds():
    from infercnv_tpu.native import get_leiden_lib

    import os
    if os.environ.get("INFERCNV_TPU_NO_NATIVE"):
        pytest.skip("native disabled")
    assert get_leiden_lib() is not None, "C++ leiden failed to build/load"


def test_auto_resolution_formula():
    # reference: (11.98/ncells)^(1/1.165) (inferCNV_tumor_subclusters.R:588)
    assert auto_resolution(100) == pytest.approx((11.98 / 100) ** (1 / 1.165))


def test_knn_and_snn_graph_shapes(rng):
    n, k = 30, 5
    nn = np.stack([np.r_[i, rng.choice(np.delete(np.arange(n), i), k - 1, replace=False)]
                   for i in range(n)])
    A = knn_graph(nn, n)
    assert A.shape == (n, n)
    assert (A != A.T).nnz == 0  # symmetric
    S = snn_graph(nn, n)
    assert S.shape == (n, n)
    assert (S != S.T).nnz == 0
    assert S.diagonal().sum() == 0


def test_native_leiden_builds_and_loads():
    """Pin the C++ fast path: the scale benchmarks depend on it, so CI must
    fail loudly if the .so stops building (VERDICT r2 item 7)."""
    import os

    if os.environ.get("INFERCNV_TPU_NO_NATIVE"):
        import pytest

        pytest.skip("native disabled by env")
    from infercnv_tpu.native import get_leiden_lib, leiden_native

    assert get_leiden_lib() is not None, "native/leiden.cpp failed to build/load"
    # and it actually partitions: two 10-cliques joined by one edge
    import numpy as np
    from scipy import sparse

    n = 20
    A = np.zeros((n, n))
    A[:10, :10] = 1
    A[10:, 10:] = 1
    np.fill_diagonal(A, 0)
    A[9, 10] = A[10, 9] = 1
    A = sparse.csr_matrix(A)
    memb = leiden_native(A.indptr, A.indices, A.data, n, "CPM", 0.3, 7, 10)
    assert memb is not None
    assert len(set(memb[:10])) == 1 and len(set(memb[10:])) == 1
    assert memb[0] != memb[-1]
