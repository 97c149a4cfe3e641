"""Randomization-module tests — the reference's own invariants
(DegreePreservingShuffleGTest / EdgeSwitchingGTest): the permutation is
valid and degree-preserving, edge switching preserves the exact degree
sequence, keeps the graph simple, and actually changes the edge set;
everything is seed-deterministic."""

import collections

from pyspark.sql import functions as F

from networkit_spark.generators import erdos_renyi
from networkit_spark.graph import Graph
from networkit_spark.operators.randomization import (
    degree_preserving_shuffle,
    edge_switching,
    shuffled_graph,
)

from tests.conftest import spark  # noqa: F401


def _degrees(g: Graph) -> dict:
    return {
        r["id"]: r["d"]
        for r in g.symmetrized_edges()
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("d"))
        .collect()
    }


def test_shuffle_is_degree_class_permutation(spark):  # noqa: F811
    edges = erdos_renyi(spark, 60, 0.12, seed=5)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(60))
    perm = {r["id"]: r["new_id"] for r in degree_preserving_shuffle(g, seed=3).collect()}
    # valid permutation over all 60 ids
    assert sorted(perm) == list(range(60))
    assert sorted(perm.values()) == list(range(60))
    # stays within the degree class
    deg = _degrees(g)
    for a, b in perm.items():
        assert deg.get(a, 0) == deg.get(b, 0)
    # deterministic / seed-sensitive
    again = {r["id"]: r["new_id"] for r in degree_preserving_shuffle(g, seed=3).collect()}
    other = {r["id"]: r["new_id"] for r in degree_preserving_shuffle(g, seed=4).collect()}
    assert perm == again
    assert perm != other


def test_shuffled_graph_preserves_degree_sequence(spark):  # noqa: F811
    edges = erdos_renyi(spark, 50, 0.15, seed=2)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(50))
    g2 = shuffled_graph(g, seed=9)
    assert sorted(_degrees(g).values()) == sorted(_degrees(g2).values())
    assert g2.edges.count() == g.edges.count()


def test_shuffle_directed_uses_degree_pairs(spark):  # noqa: F811
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (0, 3)]
    g = Graph.from_pairs(spark, pairs, directed=True, n=5)
    perm = {r["id"]: r["new_id"] for r in degree_preserving_shuffle(g, seed=1).collect()}
    out_d = collections.Counter(u for u, _ in pairs)
    in_d = collections.Counter(v for _, v in pairs)
    for a, b in perm.items():
        assert (in_d.get(a, 0), out_d.get(a, 0)) == (in_d.get(b, 0), out_d.get(b, 0))


def test_edge_switching_invariants(spark):  # noqa: F811
    edges = erdos_renyi(spark, 40, 0.2, seed=7)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(40))
    before = {
        (r["u"], r["v"])
        for r in g.edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        ).distinct().collect()
    }
    g2 = edge_switching(g, switches_per_edge=2.5, seed=11)
    after = {
        (r["u"], r["v"])
        for r in g2.edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        ).distinct().collect()
    }
    # exact degree sequence, same edge count, still simple
    assert sorted(_degrees(g).values()) == sorted(_degrees(g2).values())
    assert len(after) == len(before)
    assert all(u != v for u, v in after)
    # the chain actually moved
    assert after != before
    changed = len(after - before)
    assert changed > len(before) * 0.15


def test_edge_switching_deterministic(spark):  # noqa: F811
    edges = erdos_renyi(spark, 30, 0.2, seed=1)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(30))

    def eset(gr):
        return {
            (r["u"], r["v"])
            for r in gr.edges.select(
                F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
            ).distinct().collect()
        }

    a = eset(edge_switching(g, switches_per_edge=2.0, seed=5))
    b = eset(edge_switching(g, switches_per_edge=2.0, seed=5))
    c = eset(edge_switching(g, switches_per_edge=2.0, seed=6))
    assert a == b
    assert a != c
