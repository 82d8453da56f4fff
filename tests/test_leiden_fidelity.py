"""Leiden fidelity vs the CPM objective and the reference's behavior at
scale (VERDICT r3 item 3).

igraph/leidenalg are not installable in this image, so fidelity is
established against REFERENCE-SEMANTICS ORACLES — graph families whose
CPM-optimal partition is provable:

* disjoint cliques: merging communities with no cross edges changes CPM by
  exactly -gamma*n1*n2 < 0, and splitting a clique of size n at gamma < 1
  loses (1-gamma)*n1*n2 > 0 — so the unique optimum is {each clique}.
  igraph's cluster_leiden optimizes the same objective and therefore
  returns the same partition (its heuristic also never applies a
  strictly-negative-gain merge).
* two cliques with b bridge edges: merging gains b - gamma*n1*n2 — the
  optimum merges iff b > gamma*n1*n2.  We test both sides of the
  threshold.

These pin down exactly the property the 100k-cell question hinges on:
under CPM, NO Leiden implementation can merge disconnected SNN
components, so subcluster counts at scale are governed by SNN-graph
connectivity (quantified in scripts/leiden_fidelity.py + PARITY.md), not
by implementation differences.
"""

import numpy as np
import pytest
from scipy import sparse

from infercnv_tpu.subcluster.leiden import (
    auto_resolution,
    leiden,
    snn_graph,
)
from infercnv_tpu.subcluster.partition import _leiden_partition


def _clique_block(sizes, bridges=()):
    """Adjacency of disjoint cliques plus optional bridge edges
    [(i, j), ...] given in global node ids."""
    n = sum(sizes)
    A = np.zeros((n, n))
    off = 0
    for s in sizes:
        A[off:off + s, off:off + s] = 1.0
        off += s
    np.fill_diagonal(A, 0.0)
    for i, j in bridges:
        A[i, j] = A[j, i] = 1.0
    return sparse.csr_matrix(A)


def _partition_sets(memb):
    out = {}
    for i, m in enumerate(memb):
        out.setdefault(m, set()).add(i)
    return sorted(map(frozenset, out.values()), key=min)


def test_cpm_oracle_disjoint_cliques():
    sizes = [12, 7, 5, 3]
    A = _clique_block(sizes)
    for gamma in (0.9, 0.25, 0.01):
        memb = leiden(A, gamma, objective="CPM", seed=0)
        parts = _partition_sets(memb)
        off = 0
        expected = []
        for s in sizes:
            expected.append(frozenset(range(off, off + s)))
            off += s
        assert parts == sorted(expected, key=min), (gamma, parts)


def test_cpm_oracle_bridge_threshold():
    n1 = n2 = 10
    gamma = 0.05  # merge iff bridges > gamma*n1*n2 = 5
    # 3 bridges < 5: stay split
    A = _clique_block([n1, n2], bridges=[(0, 10), (1, 11), (2, 12)])
    memb = leiden(A, gamma, objective="CPM", seed=0)
    assert len(set(memb)) == 2
    # 8 bridges > 5: merge
    A = _clique_block([n1, n2],
                      bridges=[(i, n1 + i) for i in range(8)])
    memb = leiden(A, gamma, objective="CPM", seed=0)
    assert len(set(memb)) == 1


def test_cpm_never_merges_disconnected_components():
    """The key scale property: disconnected SNN components can never merge
    under CPM (gain is -gamma*n1*n2 < 0), so partition count >= component
    count — for ANY faithful Leiden implementation, ours or igraph's."""
    rng = np.random.default_rng(0)
    blocks = []
    for s in (30, 20, 15):
        B = (rng.random((s, s)) < 0.4).astype(float)
        B = np.triu(B, 1)
        B = B + B.T
        # ensure connectivity within the block
        for i in range(s - 1):
            B[i, i + 1] = B[i + 1, i] = 1.0
        blocks.append(B)
    n = sum(b.shape[0] for b in blocks)
    A = np.zeros((n, n))
    off = 0
    comp_of = np.empty(n, int)
    for ci, b in enumerate(blocks):
        s = b.shape[0]
        A[off:off + s, off:off + s] = b
        comp_of[off:off + s] = ci
        off += s
    memb = leiden(sparse.csr_matrix(A), auto_resolution(n),
                  objective="CPM", seed=1)
    # no community spans two components
    for m in set(memb):
        comps = set(comp_of[np.asarray(memb) == m])
        assert len(comps) == 1, (m, comps)


def _cpm_score(A, memb, gamma):
    memb = np.asarray(memb)
    score = 0.0
    for m in set(memb.tolist()):
        sel = np.nonzero(memb == m)[0]
        w_in = A[np.ix_(sel, sel)].sum() / 2.0
        nc = sel.size
        score += w_in - gamma * nc * (nc - 1) / 2.0
    return score


@pytest.mark.parametrize("n,k_planted", [(1000, 4), (4000, 6)])
def test_auto_resolution_recovers_planted_subclones(n, k_planted):
    """The full PCA->kNN->SNN->Leiden route with the reference's auto
    resolution (11.98/n)^(1/1.165): planted CNV subclones are never MIXED
    (each found community lives inside one planted clone), and our
    partition scores at least as high on the CPM objective as both the
    planted truth and the SNN connected components — i.e. any extra splits
    are the OBJECTIVE's verdict on this graph (a partition igraph's
    cluster_leiden, optimizing the same objective, would also prefer),
    not an implementation artifact."""
    rng = np.random.default_rng(7)
    G = 600
    x = rng.normal(0, 0.08, (n, G)).astype(np.float32) + 1.0
    per = n // k_planted
    planted = np.zeros(n, int)
    for c in range(k_planted):
        lo = c * per
        hi = n if c == k_planted - 1 else lo + per
        b0 = (c * 97) % (G - 120)
        x[lo:hi, b0:b0 + 100] += 0.55  # subclone-specific CNV block
        planted[lo:hi] = c
    part = _leiden_partition(x, k_nn=20, resolution="auto",
                             method="PCA", objective="CPM", seed=0)
    # purity: no found community mixes two planted subclones
    for m in set(part.tolist()):
        clones = set(planted[part == m].tolist())
        assert len(clones) == 1, (m, clones)
    # objective fidelity on the actual SNN graph
    from infercnv_tpu.subcluster.distance import knn_indices
    from infercnv_tpu.subcluster.pca import pca_embed

    emb = pca_embed(x, n_components=10)
    nn = np.asarray(knn_indices(emb, 20))
    A = snn_graph(nn, n)
    n_comp, comp = sparse.csgraph.connected_components(A, directed=False)
    gamma = auto_resolution(n)
    ours = _cpm_score(A, part, gamma)
    assert ours >= _cpm_score(A, planted, gamma) - 1e-9
    assert ours >= _cpm_score(A, comp, gamma) - 1e-9
    # and partitions can never be fewer than the components
    assert len(set(part.tolist())) >= n_comp
