"""Maximum spanning forest (Borůvka) vs a Kruskal union-find oracle
(UnionMaximumSpanningForest / KruskalMSF reference semantics), plus the
plain spanning forest's count/connectivity contract
(SpanningForest.cpp:15-31)."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.components import connected_components
from networkit_spark.operators.spanning import (
    maximum_spanning_forest,
    spanning_forest,
)
from tests.fixtures import erdos_renyi


def _kruskal_msf(n, wedges):
    """Max spanning forest via union-find; returns (edge set, weight)."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    chosen, total = set(), 0.0
    for u, v, w in sorted(wedges, key=lambda e: (-e[2], e[0], e[1])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            chosen.add((min(u, v), max(u, v)))
            total += w
    return chosen, total


def test_msf_unique_weights_exact(spark):
    """Distinct weights → the maximum forest is unique → Borůvka must
    return exactly Kruskal's edge set."""
    edges = erdos_renyi(30, 0.15, seed=31)
    wedges = [(u, v, float((u * 37 + v * 101) % 997) + 1.0) for u, v in edges]
    g = Graph.from_pairs(spark, wedges, directed=False, n=30, weighted=True)
    got = {(r["u"], r["v"]) for r in maximum_spanning_forest(g).collect()}
    want, _ = _kruskal_msf(30, wedges)
    assert got == want


def test_msf_tie_weights_same_total(spark):
    """Equal weights: any maximum forest is valid — totals and edge
    counts must match the oracle, and the forest must be acyclic with
    the same connectivity."""
    edges = erdos_renyi(25, 0.2, seed=12)
    wedges = [(u, v, float(1 + (u + v) % 3)) for u, v in edges]
    g = Graph.from_pairs(spark, wedges, directed=False, n=25, weighted=True)
    forest = maximum_spanning_forest(g)
    rows = forest.collect()
    _, want_total = _kruskal_msf(25, wedges)
    assert sum(r["weight"] for r in rows) == pytest.approx(want_total)

    fg = Graph.from_edges(
        forest.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        directed=False,
        vertices=g.vertices(),
    )
    cc_g = connected_components(g).labels
    cc_f = connected_components(fg).labels
    assert {tuple(r) for r in cc_g.collect()} == {tuple(r) for r in cc_f.collect()}
    n_comp = cc_g.select("label").distinct().count()
    assert len(rows) == 25 - n_comp  # forest: n − #components edges


def test_spanning_forest_contract(spark):
    """Disconnected graph: one tree per component, n − #comp edges,
    connectivity preserved (what the reference's own test asserts)."""
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (6, 7), (7, 8), (8, 6)]
    g = Graph.from_pairs(spark, edges, directed=False, n=10)  # node 9 isolated
    forest = spanning_forest(g)
    rows = {(r["u"], r["v"]) for r in forest.collect()}
    assert len(rows) == 10 - 4  # components: {0,1,2},{3,4,5},{6,7,8},{9}
    fg = Graph.from_edges(
        forest.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        directed=False,
        vertices=g.vertices(),
    )
    cc_g = {tuple(r) for r in connected_components(g).labels.collect()}
    cc_f = {tuple(r) for r in connected_components(fg).labels.collect()}
    assert cc_g == cc_f


def test_msf_empty_graph(spark):
    g = Graph.from_pairs(spark, [], directed=False, n=3)
    assert maximum_spanning_forest(g).count() == 0
