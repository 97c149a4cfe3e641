"""Pages ingest: the distributed Arrow extractor must be byte-identical
per url to the frozen pure-Python reference extractor (BASELINE.json
input_hint per-row invariant), and the derived edge table must reproduce
the planted link structure."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.pagerank import pagerank
from networkit_spark.sources.pages import (
    extract_links,
    extract_text,
    generate_pages,
    pages_to_edges,
    reference_extract,
    url_id_map,
)

N_PAGES = 120


@pytest.fixture(scope="module")
def pages(spark):
    df = generate_pages(spark, N_PAGES, out_links=3, seed=42).persist()
    df.count()
    yield df
    df.unpersist()


def test_schema(pages):
    assert [f.name for f in pages.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    kinds = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
    assert kinds["html"] == "binary" and kinds["warc_ts"] == "timestamp"


def test_text_byte_identity(pages):
    """Distributed mapInPandas text == frozen reference extractor, per url."""
    rows = pages.select("url", "html", "text").collect()
    assert len(rows) == N_PAGES
    for r in rows:
        _, ref_text = reference_extract(bytes(r["html"]))
        assert r["text"] == ref_text, r["url"]
        assert r["text"].encode("utf-8") == ref_text.encode("utf-8")


def test_links_match_reference(pages):
    got = (
        extract_links(pages)
        .groupBy("src_url")
        .agg(F.sort_array(F.collect_list("dst_url")).alias("links"))
        .collect()
    )
    got = {r["src_url"]: r["links"] for r in got}
    for r in pages.select("url", "html").collect():
        ref_links, _ = reference_extract(bytes(r["html"]))
        if ref_links:
            assert got[r["url"]] == sorted(ref_links), r["url"]


def test_no_hash_collisions(pages):
    ids = url_id_map(pages)
    assert ids.select("id").distinct().count() == ids.count() == N_PAGES


def test_planted_graph_structure(spark, pages):
    """pages → edges pipeline reproduces the planted out-links under the
    xxhash64(url) id mapping."""
    edges = pages_to_edges(pages)
    idmap = {r["url"]: r["id"] for r in url_id_map(pages).collect()}
    expect = set()
    for r in pages.select("url", "html").collect():
        links, _ = reference_extract(bytes(r["html"]))
        for dst in links:
            a, b = idmap[r["url"]], idmap[dst]
            if a != b:
                expect.add((a, b))
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == expect


def test_pagerank_on_pages_graph(spark, pages):
    """End-to-end: pages → edges → PageRank runs and mass sums to ~1."""
    g = Graph.from_edges(pages_to_edges(pages), directed=True)
    res = pagerank(g, tol=1e-6, max_iterations=30)
    total = res.scores.agg(F.sum("score")).first()[0]
    assert abs(total - 1.0) < 1e-6  # directed NO_SINK_HANDLING L1-normalizes


def test_empty_anchor_batch(spark):
    """Pages with zero links produce an empty edge table, not a crash."""
    df = generate_pages(spark, 5, out_links=0, seed=1)
    assert pages_to_edges(df).count() == 0
    # text still extracted (title + filler paragraph)
    row = df.select("html", "text").first()
    _, ref_text = reference_extract(bytes(row["html"]))
    assert row["text"] == ref_text
