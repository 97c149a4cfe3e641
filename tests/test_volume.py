"""Volume + NeighborhoodFunctionHeuristic — pure-Python replicas of
Volume.cpp / NeighborhoodFunctionHeuristic.cpp over the engine's
deterministic samples."""

from pyspark.sql import functions as F

from networkit_spark.generators import erdos_renyi
from networkit_spark.graph import Graph
from networkit_spark.operators.volume import (
    neighborhood_function_heuristic,
    volume,
)

from tests.conftest import spark  # noqa: F811,F401


def _adj(rows):
    adj = {}
    for r in rows:
        adj.setdefault(r["src"], set()).add(r["dst"])
        adj.setdefault(r["dst"], set()).add(r["src"])
    return adj


def _bfs(adj, s):
    d, frontier, lvl = {s: 0}, [s], 0
    while frontier:
        lvl += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in d:
                    d[v] = lvl
                    nxt.append(v)
        frontier = nxt
    return d


def test_volume_matches_bruteforce(spark):  # noqa: F811
    edges = erdos_renyi(spark, 50, 0.06, seed=9)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(50))
    adj = _adj(edges.collect())
    seeds = [i for i in range(50) if i % 7 == 0]
    got = {r["r"]: r["volume"]
           for r in volume(g, [1.0, 2.0, 3.0], modulus=7).collect()}
    for r in (1.0, 2.0, 3.0):
        want = sum(
            sum(1 for d in _bfs(adj, s).values() if d <= r) for s in seeds
        ) / len(seeds)
        assert abs(got[r] - want) < 1e-12, r


def test_nf_heuristic_random_strategy(spark):  # noqa: F811
    edges = erdos_renyi(spark, 40, 0.12, seed=3)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(40))
    adj = _adj(edges.collect())
    alld = {s: _bfs(adj, s) for s in range(40)}
    assert all(len(d) == 40 for d in alld.values())  # connected fixture
    dia = max(max(d.values()) for d in alld.values())
    n, m = 40, edges.count()
    seeds = [i for i in range(40) if i % 5 == 0]
    hist = {}
    for s in seeds:
        for d in alld[s].values():
            hist[d] = hist.get(d, 0) + 1
    want = [0] * dia
    want[0] = 2 * m
    want[dia - 1] = n * (n - 1)
    norm = n / len(seeds)
    for h in range(2, dia):
        want[h - 1] = int(hist.get(h, 0) * norm + 0.5) + want[h - 2]
    got = {r["h"]: r["nf"]
           for r in neighborhood_function_heuristic(
               g, strategy="random", modulus=5).collect()}
    assert got == {h + 1: v for h, v in enumerate(want)}


def test_nf_heuristic_split_monotone(spark):  # noqa: F811
    edges = erdos_renyi(spark, 36, 0.14, seed=4)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(36))
    got = [r["nf"] for r in neighborhood_function_heuristic(
        g, n_samples=9, strategy="split").orderBy("h").collect()]
    assert got[0] == 2 * edges.count()
    assert got[-1] == 36 * 35
    assert all(a <= b for a, b in zip(got[1:-1], got[2:-1]))


def test_hop_plot_approximation_shape(spark):  # noqa: F811
    from networkit_spark.operators.volume import hop_plot_approximation

    edges = erdos_renyi(spark, 40, 0.18, seed=7)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(40))
    hp = hop_plot_approximation(g, k=32, seed=5)
    assert hp[0] == 1.0 / 40
    assert all(0.0 <= a <= 1.0 for a in hp)
    assert all(a <= b + 1e-12 for a, b in zip(hp, hp[1:]))  # nondecreasing
    assert hp[-1] > 0.9  # connected fixture saturates near 1
