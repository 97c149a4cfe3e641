"""ComplexPathAlgorithm parity vs a pure-Python replica of
ComplexPaths.cpp:90-208 (deterministic smallest-id seed substitution
for std::sample — the engine's standard deterministic-draw rule)."""

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.complexpaths import (
    complex_path_lengths,
    complex_paths_graph,
)
from tests.test_commutetime import _connected_er


def _ref(und, nodes, seed, t):
    """Replica of complexPathsGraph's synchronous fixed point with the
    deterministic seed rule: (complex canonical edges, {id: round})."""
    adj = {u: set() for u in nodes}
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    need = t - 1
    nbrs = sorted(adj[seed])[:need]
    if len(nbrs) < need:
        d2 = sorted(
            {x for u in adj[seed] for x in adj[u]} - {seed} - set(nbrs)
        )
        nbrs += d2[: need - len(nbrs)]
    active = {seed: 0}
    for s in nbrs:
        active[s] = 0
    rnd = 0
    while True:
        rnd += 1
        ce = {
            (min(u, v), max(u, v)) for u in active for v in adj[u]
        }
        infl = {}
        for u, v in ce:
            infl[u] = infl.get(u, 0) + 1
            infl[v] = infl.get(v, 0) + 1
        fresh = sorted(
            w for w, c in infl.items() if c >= t and w not in active
        )
        if not fresh:
            return ce, active
        for w in fresh:
            active[w] = rnd


def _ref_plci(und, nodes, seed, t):
    ce, _ = _ref(und, nodes, seed, t)
    adj = {}
    for u, v in ce:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist = {seed: 0}
    frontier = [seed]
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    return sum(dist.values()) / len(nodes)


@pytest.mark.parametrize("seed_node,t", [(0, 3), (2, 4)])
def test_complex_graph_matches_replica(spark, seed_node, t):
    g, und = _connected_er(spark, 16, 0.25, seed=9)
    want_ce, want_active = _ref(und, range(16), seed_node, t)
    ce, adopters = complex_paths_graph(g, seed_node, t)
    got_ce = {(r["u"], r["v"]) for r in ce.collect()}
    got_active = {r["id"]: r["round"] for r in adopters.collect()}
    adopters.unpersist()
    assert got_ce == want_ce
    assert got_active == want_active


def test_plci_matches_replica(spark):
    g, und = _connected_er(spark, 14, 0.3, seed=4)
    sources = [0, 7]
    got = {
        r["id"]: r["plci"]
        for r in complex_path_lengths(g, 3, sources=sources).collect()
    }
    for s in sources:
        want = _ref_plci(und, range(14), s, 3)
        assert abs(got[s] - want) < 1e-12, (s, got[s], want)


def test_plci_normalized_bounds(spark):
    # min-max normalization over the computed sources (the reference
    # normalizes over all nodes; same formula, subset of sources)
    g, und = _connected_er(spark, 12, 0.35, seed=11)
    sources = [0, 4, 9]
    out = complex_path_lengths(g, 3, sources=sources, normalized=True).collect()
    vals = sorted(r["plci"] for r in out)
    assert vals[0] == 0.0 and vals[-1] == 1.0
    raw = {s: _ref_plci(und, range(12), s, 3) for s in sources}
    lo, hi = min(raw.values()), max(raw.values())
    got = {r["id"]: r["plci"] for r in out}
    for s in sources:
        assert abs(got[s] - (raw[s] - lo) / (hi - lo)) < 1e-12


def test_distance2_seed_fallback(spark):
    # seed 0 has one direct neighbor (1); threshold 3 needs two seeds —
    # the deterministic fallback takes the smallest distance-2 node (2)
    edges = [(0, 1), (1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    g = Graph.from_pairs(spark, edges, directed=False)
    ce, adopters = complex_paths_graph(g, 0, 3)
    got = {r["id"]: r["round"] for r in adopters.collect()}
    adopters.unpersist()
    want_ce, want_active = _ref(edges, range(5), 0, 3)
    assert got == want_active
    assert {(r["u"], r["v"]) for r in ce.collect()} == want_ce


def test_threshold_validation(spark):
    g = Graph.from_pairs(spark, [(0, 1)], directed=False)
    with pytest.raises(ValueError):
        complex_paths_graph(g, 0, 0)
