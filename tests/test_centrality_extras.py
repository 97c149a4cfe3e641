"""Sfigality + LocalSquareClusteringCoefficient vs pure-Python replicas of
the reference loops (Sfigality.cpp:16-28,
LocalSquareClusteringCoefficient.cpp:20-50)."""

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.centrality import local_square_clustering, sfigality

from tests.fixtures import F2_EDGES, F2_N, erdos_renyi


def _adj(edges, n):
    nbrs = {u: set() for u in range(n)}
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    return nbrs


def _sfigality_ref(edges, n):
    nbrs = _adj(edges, n)
    deg = {u: len(nbrs[u]) for u in nbrs}
    out = {}
    for u in range(n):
        if deg[u] == 0:
            out[u] = 0.0  # engine convention (reference: 0/0 NaN, untested)
            continue
        out[u] = sum(1 for v in nbrs[u] if deg[u] < deg[v]) / deg[u]
    return out


def _square_ref(edges, n):
    # exact LocalSquareClusteringCoefficient.cpp loop
    nbrs = _adj(edges, n)
    deg = {u: len(nbrs[u]) for u in nbrs}
    out = {}
    for u in range(n):
        ns = sorted(nbrs[u])
        squares = 0.0
        pot = 0.0
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                v, w = ns[i], ns[j]
                common = len(nbrs[v] & nbrs[w])
                squares += common - 1
                pot += deg[v] + deg[w] - common - 1
                if w in nbrs[v]:
                    pot -= 2
        out[u] = squares / pot if pot > 0 else 0.0
    return out


def _run(spark, op, edges, n):
    g = Graph.from_pairs(spark, edges, directed=False, n=n)
    return {r.id: r.score for r in op(g).collect()}


def test_sfigality_f2(spark):
    got = _run(spark, sfigality, F2_EDGES, F2_N)
    want = _sfigality_ref(F2_EDGES, F2_N)
    assert got.keys() == want.keys()
    for u in want:
        assert got[u] == pytest.approx(want[u], abs=1e-12)


def test_sfigality_er(spark):
    edges = erdos_renyi(50, 0.1, seed=11)
    n = 50
    got = _run(spark, sfigality, edges, n)
    want = _sfigality_ref(edges, n)
    for u in want:
        assert got[u] == pytest.approx(want[u], abs=1e-12)


def test_square_clustering_f2(spark):
    got = _run(spark, local_square_clustering, F2_EDGES, F2_N)
    want = _square_ref(F2_EDGES, F2_N)
    for u in want:
        assert got[u] == pytest.approx(want[u], abs=1e-12), u


def test_square_clustering_c4(spark):
    # a pure 4-cycle: every node closes exactly its one potential square
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    got = _run(spark, local_square_clustering, edges, 4)
    want = _square_ref(edges, 4)
    for u in want:
        assert got[u] == pytest.approx(want[u], abs=1e-12)
    assert got[0] == pytest.approx(1.0)


def test_square_clustering_er(spark):
    edges = erdos_renyi(35, 0.15, seed=13)
    got = _run(spark, local_square_clustering, edges, 35)
    want = _square_ref(edges, 35)
    for u in want:
        assert got[u] == pytest.approx(want[u], abs=1e-12), u


def test_square_clustering_rejects_directed_and_loops(spark):
    with pytest.raises(ValueError):
        local_square_clustering(Graph.from_pairs(spark, [(0, 1)], directed=True))
    with pytest.raises(ValueError):
        local_square_clustering(
            Graph.from_pairs(spark, [(0, 0), (0, 1)], directed=False)
        )
