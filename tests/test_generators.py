"""Distributed generators: determinism, expected structure, skew shape."""

from pyspark.sql import functions as F

from networkit_spark.generators import erdos_renyi, planted_partition, rmat
from networkit_spark.graph import Graph
from networkit_spark.operators.components import connected_components


def test_er_deterministic(spark):
    a = erdos_renyi(spark, 50, 0.1, seed=1)
    b = erdos_renyi(spark, 50, 0.1, seed=1)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    c = erdos_renyi(spark, 50, 0.1, seed=2)
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, c.collect()))


def test_er_edge_probability(spark):
    n, p = 100, 0.1
    m = erdos_renyi(spark, n, p, seed=3).count()
    expect = p * n * (n - 1) / 2
    assert 0.7 * expect < m < 1.3 * expect


def test_planted_cliques_components(spark):
    e = planted_partition(spark, 60, 3, p_intra=1.0, p_inter=0.0, seed=4)
    assert e.count() == 3 * 20 * 19 // 2
    g = Graph.from_edges(e, directed=False)
    assert connected_components(g).number_of_components() == 3


def test_rmat_shape(spark):
    df = rmat(spark, scale=8, edge_factor=4, seed=5)
    n = 1 << 8
    assert df.count() == n * 4
    mx = df.agg(F.max("src"), F.max("dst")).first()
    assert mx[0] < n and mx[1] < n
    # power-law-ish: the hottest vertex has far more than mean degree
    top = (
        df.groupBy("src").count().agg(F.max("count")).first()[0]
    )
    assert top > 4 * 4  # mean out-degree is 4


def test_rmat_deterministic(spark):
    a = rmat(spark, scale=6, edge_factor=2, seed=7).collect()
    b = rmat(spark, scale=6, edge_factor=2, seed=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
