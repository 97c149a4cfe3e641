"""Conductance, sampled rand measures, ClusteringGenerator — formula
replicas and reference contracts."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.generators import erdos_renyi
from networkit_spark.graph import Graph
from networkit_spark.operators.evaluation import (
    conductance,
    node_structural_rand,
    sampled_graph_structural_rand,
    sampled_node_structural_rand,
)
from networkit_spark.operators.quality import (
    is_proper_clustering,
    make_continuous_balanced_clustering,
    make_noncontinuous_balanced_clustering,
    make_one_clustering,
    make_random_clustering,
    make_singleton_clustering,
)

from tests.conftest import spark  # noqa: F401


def _g(spark, n=30, p=0.15, seed=6):
    e = erdos_renyi(spark, n, p, seed=seed)
    return Graph.from_edges(e, directed=False, vertices=spark.range(n)), n


def test_conductance_formula(spark):  # noqa: F811
    g, n = _g(spark)
    labels = g.vertices().select("id", (F.col("id") % 2).alias("label"))
    el = [(r["u"], r["v"]) for r in g.simple_undirected_edges().collect()]
    cut = sum(1 for u, v in el if u % 2 != v % 2)
    deg = {}
    for u, v in el:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    vol = [sum(d for u, d in deg.items() if u % 2 == s) for s in (0, 1)]
    want = cut / min(vol)
    assert abs(conductance(g, labels) - want) < 1e-12
    with pytest.raises(ValueError):
        conductance(g, make_one_clustering(g))


def test_sampled_rand_bounds_and_consistency(spark):  # noqa: F811
    g, n = _g(spark, 40, 0.12, 3)
    zeta = g.vertices().select("id", (F.col("id") % 3).alias("label"))
    eta = g.vertices().select("id", (F.col("id") % 4).alias("label"))
    d = sampled_node_structural_rand(g, zeta, eta, max_samples=400, seed=2)
    full = node_structural_rand(g, zeta, eta)
    assert 0.0 <= d <= 1.0
    assert abs(d - full) < 0.15  # estimator tracks the exact value
    # identical partitions → dissimilarity 0 at ANY sample
    assert sampled_node_structural_rand(g, zeta, zeta, 200, seed=5) == 0.0
    dg = sampled_graph_structural_rand(g, zeta, eta, max_samples=300, seed=2)
    assert 0.0 <= dg <= 1.0
    assert sampled_graph_structural_rand(g, eta, eta, 200, seed=7) == 0.0


def test_clustering_generators(spark):  # noqa: F811
    g, n = _g(spark, 23, 0.1, 9)
    s = make_singleton_clustering(g)
    assert s.select("label").distinct().count() == n
    o = make_one_clustering(g)
    assert o.select("label").distinct().count() == 1
    r = make_random_clustering(g, 4, seed=3)
    assert is_proper_clustering(g, r)
    assert r.select("label").distinct().count() <= 4
    for k in (4, 5):
        c = make_continuous_balanced_clustering(g, k)
        sizes = sorted(
            x["c"] for x in c.groupBy("label").agg(F.count("*").alias("c")).collect()
        )
        assert sum(sizes) == n and max(sizes) - min(sizes) <= 1
        # contiguous in id-rank order
        rows = sorted((x["id"], x["label"]) for x in c.collect())
        labs = [lb for _, lb in rows]
        assert labs == sorted(labs)
        nc = make_noncontinuous_balanced_clustering(g, k)
        sizes = sorted(
            x["c"] for x in nc.groupBy("label").agg(F.count("*").alias("c")).collect()
        )
        assert sum(sizes) == n and max(sizes) - min(sizes) <= 1
