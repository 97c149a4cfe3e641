"""Matrix Market reader/writer (MTXGraphReader.cpp / MTXParser.cpp parity)."""

import pytest

from networkit_spark.sources.gml import read_graph
from networkit_spark.sources.mtx import read_mtx, write_mtx

MTX_GENERAL_REAL = """%%MatrixMarket matrix coordinate real general
% a comment
% another comment
4 3 5
1 2 0.5
2 3 1.5
3 1 2.0
4 1 3.0
1 1 7.0
"""

MTX_SYMMETRIC_PATTERN = """%%MatrixMarket matrix coordinate pattern symmetric
5 5 4
2 1
3 1
4 2
5 5
"""


def _arcs(g, weights=False):
    cols = ("src", "dst", "weight") if weights else ("src", "dst")
    return sorted(tuple(r[c] for c in cols) for r in g.edges.select(*cols).collect())


def test_general_real_is_directed_weighted(spark, tmp_path):
    p = tmp_path / "g.mtx"
    p.write_text(MTX_GENERAL_REAL)
    g = read_mtx(spark, str(p))
    assert g.directed and g.weighted
    # n = max(rows, cols) = 4, 1-based -> 0-based
    assert g.num_vertices() == 4
    assert _arcs(g, weights=True) == [
        (0, 0, 7.0), (0, 1, 0.5), (1, 2, 1.5), (2, 0, 2.0), (3, 0, 3.0),
    ]


def test_symmetric_pattern_is_undirected_unweighted(spark, tmp_path):
    p = tmp_path / "s.mtx"
    p.write_text(MTX_SYMMETRIC_PATTERN)
    g = read_mtx(spark, str(p))
    assert not g.directed and not g.weighted
    assert g.num_vertices() == 5
    assert g.num_edges() == 4
    und = sorted(
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in g.edges.select("src", "dst").collect()
        if r["src"] <= r["dst"]
    )
    assert und == [(0, 1), (0, 2), (1, 3), (4, 4)]


def test_missing_weight_column_defaults_to_one(spark, tmp_path):
    p = tmp_path / "w.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real general\n3 3 2\n1 2 2.5\n2 3\n"
    )
    g = read_mtx(spark, str(p))
    assert _arcs(g, weights=True) == [(0, 1, 2.5), (1, 2, 1.0)]


def test_bad_header_raises(spark, tmp_path):
    p = tmp_path / "bad.mtx"
    p.write_text("%%MatrixMarket matrix array real general\n2 2\n1.0\n")
    with pytest.raises(ValueError):
        read_mtx(spark, str(p))


def test_roundtrip_directed(spark, tmp_path):
    p = tmp_path / "g.mtx"
    p.write_text(MTX_GENERAL_REAL)
    g = read_mtx(spark, str(p))
    out = tmp_path / "out.mtx"
    write_mtx(g, str(out))
    g2 = read_mtx(spark, str(out))
    assert g2.directed and g2.weighted
    assert _arcs(g, weights=True) == _arcs(g2, weights=True)
    assert g2.num_vertices() == g.num_vertices()


def test_roundtrip_undirected(spark, tmp_path):
    p = tmp_path / "s.mtx"
    p.write_text(MTX_SYMMETRIC_PATTERN)
    g = read_mtx(spark, str(p))
    out = tmp_path / "out.mtx"
    write_mtx(g, str(out))
    g2 = read_mtx(spark, str(out))
    assert not g2.directed and not g2.weighted
    assert _arcs(g) == _arcs(g2)
    assert g2.num_vertices() == g.num_vertices()


def test_read_graph_sniffs_mtx(spark, tmp_path):
    # by extension
    p = tmp_path / "g.mtx"
    p.write_text(MTX_GENERAL_REAL)
    assert read_graph(spark, str(p)).num_edges() == 5
    # by banner, wrong extension
    q = tmp_path / "mystery.txt"
    q.write_text(MTX_SYMMETRIC_PATTERN)
    g = read_graph(spark, str(q))
    assert not g.directed and g.num_edges() == 4
