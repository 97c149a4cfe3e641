"""Pruned landmark labeling — exact-query parity with BFS distances on
random graphs (undirected + directed), pruning effectiveness, and
batch-size invariance (the batched substitution changes label SIZE,
never query answers)."""

from pyspark.sql import functions as F

from networkit_spark.generators import erdos_renyi
from networkit_spark.graph import Graph
from networkit_spark.operators.pll import (
    pll_query,
    pruned_landmark_labeling,
)

from tests.conftest import spark  # noqa: F401


def _bfs_all(rows, n, directed):
    adj = {}
    for r in rows:
        adj.setdefault(r["src"], []).append(r["dst"])
        if not directed:
            adj.setdefault(r["dst"], []).append(r["src"])
    dist = {}
    for s in range(n):
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
        for v, dd in d.items():
            dist[(s, v)] = dd
    return dist


def _pairs_df(spark, n):
    return spark.createDataFrame(
        [(s, t) for s in range(0, n, 3) for t in range(0, n, 4)],
        "s long, t long",
    )


def test_pll_undirected_exact(spark):  # noqa: F811
    n = 40
    edges = erdos_renyi(spark, n, 0.07, seed=6)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(n))
    want = _bfs_all(edges.collect(), n, directed=False)
    labels = pruned_landmark_labeling(g, batch_size=8)
    got = {
        (r["s"], r["t"]): r["dist"]
        for r in pll_query(labels, labels, _pairs_df(spark, n)).collect()
    }
    for s in range(0, n, 3):
        for t in range(0, n, 4):
            assert got.get((s, t)) == want.get((s, t)), (s, t)
    # pruning actually prunes: the full BFS closure has one entry per
    # reachable (hub, node) pair; PLL must store strictly fewer
    assert labels.count() < len(want)


def test_pll_directed_exact(spark):  # noqa: F811
    n = 30
    edges = erdos_renyi(spark, n, 0.08, seed=11, directed=True)
    g = Graph.from_edges(edges, directed=True, vertices=spark.range(n))
    want = _bfs_all(edges.collect(), n, directed=True)
    labels_out, labels_in = pruned_landmark_labeling(g, batch_size=8)
    got = {
        (r["s"], r["t"]): r["dist"]
        for r in pll_query(labels_in, labels_out, _pairs_df(spark, n)).collect()
    }
    for s in range(0, n, 3):
        for t in range(0, n, 4):
            assert got.get((s, t)) == want.get((s, t)), (s, t)


def test_pll_batch_size_invariance(spark):  # noqa: F811
    n = 25
    edges = erdos_renyi(spark, n, 0.12, seed=4)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(n))
    pairs = _pairs_df(spark, n)
    l1 = pruned_landmark_labeling(g, batch_size=1)
    l2 = pruned_landmark_labeling(g, batch_size=64)
    q1 = {(r["s"], r["t"]): r["dist"]
          for r in pll_query(l1, l1, pairs).collect()}
    q2 = {(r["s"], r["t"]): r["dist"]
          for r in pll_query(l2, l2, pairs).collect()}
    assert q1 == q2
    # sequential batches prune at least as hard as one giant batch
    assert l1.count() <= l2.count()
