"""Real-graph golden-value parity on the reference's shipped wiki-Vote
dataset (SNAP, 7115 nodes / 103689 arcs).

Reference expectations (networkit/cpp/centrality/test/
CentralityGTest.cpp:492-519): directed PageRank's top-ranked node is 326
with score ≈ 0.00460, undirected top is 699 with ≈ 0.00432, eps 1e-3.
The reference reads the file with SNAPGraphReader(remapNodes) — node ids
in assertions are REMAPPED ids; we keep original ids and instead assert
the score values and consistency properties, plus the SNAP-documented
graph shape. Skipped when the dataset isn't present.
"""

import os

import pytest
from pyspark.sql import functions as F

from networkit_spark.operators.components import connected_components
from networkit_spark.operators.pagerank import NO_SINK_HANDLING, pagerank
from networkit_spark.sources.edgelist import read_snap

WIKI = "/root/reference/input/wiki-Vote.txt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(WIKI), reason="reference wiki-Vote dataset not present"
)


@pytest.fixture(scope="module")
def wiki_directed(spark):
    g = read_snap(spark, WIKI, directed=True)
    g.edges.persist()
    yield g
    g.edges.unpersist()


def test_graph_shape(wiki_directed):
    """SNAP header: 7115 nodes, 103689 directed edges."""
    assert wiki_directed.num_edges() == 103689
    assert wiki_directed.num_vertices() == 7115


def test_pagerank_directed_golden(wiki_directed):
    """Top PageRank score ≈ 0.00460 @ eps 1e-3 (CentralityGTest.cpp:497-505)."""
    res = pagerank(wiki_directed, damp=0.85, tol=1e-8,
                   distribute_sinks=NO_SINK_HANDLING)
    top = res.scores.orderBy(F.desc("score")).first()
    assert abs(top["score"] - 0.004599) < 1e-3
    # directed NO_SINK_HANDLING ends L1-normalized (PageRank.cpp:118-122)
    total = res.scores.agg(F.sum("score")).first()[0]
    assert abs(total - 1.0) < 1e-9


def test_pagerank_undirected_golden(spark):
    g = read_snap(spark, WIKI, directed=False)
    res = pagerank(g, damp=0.85, tol=1e-8)
    top = res.scores.orderBy(F.desc("score")).first()
    assert abs(top["score"] - 0.00432) < 1e-3


def test_weakly_connected_components(spark):
    """SNAP stats for wiki-Vote: largest WCC has 7066 of 7115 nodes."""
    g = read_snap(spark, WIKI, directed=True)
    res = connected_components(g)
    largest = res.component_sizes().agg(F.max("size")).first()[0]
    assert largest == 7066
