"""GML reader/writer + read_graph sniffing (GMLGraphReader.cpp parity)."""

from networkit_spark.sources.gml import read_gml, read_graph, write_gml

GML_DIRECTED = """graph [
  directed 1
  node [
    id 10
  ]
  node [
    id 20
    label "b"
  ]
  node [
    id 30
  ]
  edge [
    source 10
    target 20
  ]
  edge [
    source 20
    target 30
  ]
  edge [
    source 10
    target 20
  ]
  edge [
    source 30
    target 30
  ]
]
"""

GML_UNDIRECTED = """graph [
  node [ id 0 ]
  node [ id 1 ]
  node [ id 2 ]
  edge [ source 0 target 1 ]
  edge [ source 1 target 0 ]
  edge [ source 1 target 2 ]
]
"""


def _arcs(g):
    return sorted((r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect())


def test_gml_directed_file_order_ids(spark, tmp_path):
    """GML ids 10/20/30 map to internal 0/1/2 in file order
    (GMLGraphReader.cpp:60-72); duplicate edge skipped; self-loop kept."""
    p = tmp_path / "g.gml"
    p.write_text(GML_DIRECTED)
    g = read_gml(spark, str(p))
    assert g.directed
    assert g.num_vertices() == 3
    assert _arcs(g) == [(0, 1), (1, 2), (2, 2)]


def test_gml_undirected_reverse_duplicate_skipped(spark, tmp_path):
    p = tmp_path / "g.gml"
    p.write_text(GML_UNDIRECTED)
    g = read_gml(spark, str(p))
    assert not g.directed
    # symmetrized storage: each undirected edge once per direction
    assert _arcs(g) == [(0, 1), (1, 0), (1, 2), (2, 1)]


def test_gml_round_trip(spark, tmp_path):
    p1 = tmp_path / "a.gml"
    p1.write_text(GML_DIRECTED)
    g = read_gml(spark, str(p1))
    p2 = tmp_path / "b.gml"
    write_gml(g, str(p2))
    g2 = read_gml(spark, str(p2))
    assert g2.directed == g.directed
    assert g2.num_vertices() == g.num_vertices()
    assert _arcs(g2) == _arcs(g)


def test_read_graph_sniffs_gml_without_extension(spark, tmp_path):
    p = tmp_path / "mystery"
    p.write_text(GML_DIRECTED)
    g = read_graph(spark, str(p))
    assert g.directed and g.num_vertices() == 3


def test_read_graph_sniffs_edge_list(spark, tmp_path):
    p = tmp_path / "pairs.txt"
    p.write_text("0 1\n1 2\n2 3\n")
    g = read_graph(spark, str(p))
    assert g.num_vertices() == 4


def test_read_graph_sniffs_metis(spark, tmp_path):
    # 4 nodes, 3 edges, adjacency lines (1-based) — header then n lines
    p = tmp_path / "m.graph"
    p.write_text("4 3\n2\n1 3\n2 4\n3\n")
    g = read_graph(spark, str(p))
    assert g.num_vertices() == 4
    assert len(_arcs(g)) == 6  # symmetrized
