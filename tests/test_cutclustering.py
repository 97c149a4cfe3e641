"""CutClustering — Flake-Tarjan alpha-parameterized min-cut communities
(community/CutClustering.cpp): properness + the alpha limits (alpha
above the max weight → singletons; two cliques over a weak bridge split
at intermediate alpha) — the CommunityGTest.cpp:96-116 contract class."""

from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.flow import cut_clustering
from networkit_spark.operators.quality import is_proper_clustering

from tests.conftest import spark  # noqa: F401


def _two_cliques(spark):
    edges = []
    for base in (0, 5):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j, 1.0))
    edges.append((0, 5, 1.0))  # weak bridge
    e = spark.createDataFrame(edges, "src long, dst long, weight double")
    return Graph.from_edges(e, directed=False, vertices=spark.range(10))


def test_two_cliques_split(spark):  # noqa: F811
    g = _two_cliques(spark)
    res = cut_clustering(g, alpha=0.5)
    assert is_proper_clustering(g, res)
    labs = {r["id"]: r["label"] for r in res.collect()}
    assert len(labs) == 10
    left = {labs[i] for i in range(5)}
    right = {labs[i] for i in range(5, 10)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_alpha_limits(spark):  # noqa: F811
    g = _two_cliques(spark)
    # alpha above every edge weight: cutting all sink edges of {u} alone
    # (cost alpha·1... the singleton cut) beats any grouping → singletons
    hi = cut_clustering(g, alpha=5.0)
    assert hi.select("label").distinct().count() == 10
    # alpha tiny: cheapest cut isolates nothing — whole component one
    # cluster per connected component
    lo = cut_clustering(g, alpha=0.01)
    assert lo.select("label").distinct().count() == 1
