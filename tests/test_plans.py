"""Plan-quality regression tests: pushdown/pruning/plan shape must not
silently regress (PLANS.md invariants)."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.pagerank import pagerank
from networkit_spark.operators.components import connected_components
from networkit_spark.operators.triangles import total_triangles
from networkit_spark.sources.tables import derive_web_edges


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_derivation_prunes_scan(spark):
    """The lineitem scan must read exactly 2 of 16 columns."""
    e = derive_web_edges(spark, "/root/testdata/sf0.001")
    plan = _physical(e)
    assert "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint>" in plan
    # dedup combines map-side: partial HashAggregate below the exchange
    assert plan.count("HashAggregate") >= 2


def test_documents_scan_prunes_text_ops(spark):
    """token_stats only needs doc_id + text — not lang/source/n_chars."""
    from networkit_spark.functions.text import token_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _physical(token_stats(docs))
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_filter_pushdown_reaches_scan(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = docs.filter(F.col("lang") == "en").select("doc_id")
    plan = _physical(q)
    assert "PushedFilters" in plan and "EqualTo(lang,en)" in plan


# ------------------------------------------------------------- edge cases
def test_pagerank_empty_graph_raises(spark):
    e = spark.createDataFrame([], "src long, dst long, weight double")
    g = Graph.from_edges(e, directed=True)
    with pytest.raises(ValueError, match="empty"):
        pagerank(g, max_iterations=1)


def test_cc_singleton_only(spark):
    e = spark.createDataFrame([], "src long, dst long, weight double")
    v = spark.range(3)
    g = Graph.from_edges(e, directed=False, vertices=v)
    res = connected_components(g)
    assert res.number_of_components() == 3


def test_triangles_edgeless(spark):
    e = spark.createDataFrame([], "src long, dst long, weight double")
    v = spark.range(4)
    g = Graph.from_edges(e, directed=False, vertices=v)
    assert total_triangles(g) == 0
