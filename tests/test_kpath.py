"""K-path centrality: exact replay against a pure-Python walk simulator
using the same shared quadratic hash (the operator is deterministic by
construction — KPathCentrality.cpp semantics, stratified starts)."""

import math

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.kpath import kpath_centrality

M = 1_000_000_007


def _u(walk, pos, cand, seed):
    h1 = (walk * 2654435761 + pos * 40503 + cand * 97 + seed * 1000003) % M
    h2 = (h1 * h1 + 2654435761 * h1 + 40503) % M
    h3 = (h2 * h2 + 97 * h2 + 1000003) % M
    return (h3 + 1) / 1000000008.0


def py_kpath(nodes, edges, k, t, seed):
    adj = {u: set() for u in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    ranked = sorted(nodes)
    n = len(nodes)
    counter = {u: 0 for u in nodes}
    for wid in range(t):
        cur = ranked[wid % n]
        vis = {cur}
        l = 1 + math.floor(_u(wid, 0, 0, seed) * k)
        for j in range(1, int(l) + 1):
            cands = [d for d in adj[cur] if d not in vis]
            if not cands:
                break
            cur = min(cands, key=lambda d: (_u(wid, j, d, seed), d))
            vis.add(cur)
            counter[cur] += 1
    return {u: round(k * n * c / t, 9) for u, c in counter.items()}


@pytest.mark.parametrize("name,edges", [
    ("barbell", [(i, j) for i in range(4) for j in range(i + 1, 4)]
     + [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
     + [(3, 7), (7, 10)]),
    ("cycle", [(i, (i + 1) % 9) for i in range(9)]),
])
def test_exact_replay(spark, name, edges):
    nodes = sorted({x for e in edges for x in e})
    g = Graph.from_pairs(spark, [(u, v, 1.0) for u, v in edges],
                         directed=False)
    got = {r["id"]: r["score"]
           for r in kpath_centrality(g, k=4, t=500, seed=3).collect()}
    want = py_kpath(nodes, edges, 4, 500, 3)
    assert got == want


def test_star_center_dominates(spark):
    edges = [(0, i) for i in range(1, 12)]
    g = Graph.from_pairs(spark, [(u, v, 1.0) for u, v in edges],
                         directed=False)
    scores = {r["id"]: r["score"]
              for r in kpath_centrality(g, k=6, t=3000, seed=1).collect()}
    # every walk that leaves a leaf must pass through the hub
    assert scores[0] > max(scores[i] for i in range(1, 12)) * 3


def test_alpha_validation(spark):
    g = Graph.from_pairs(spark, [(0, 1, 1.0)], directed=False)
    with pytest.raises(ValueError):
        kpath_centrality(g, alpha=0.9)
