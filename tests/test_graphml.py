"""GraphML reader/writer + sniffing (graphio.pyx GraphMLSAX parity)."""

from networkit_spark.sources.gml import read_graph
from networkit_spark.sources.graphml import read_graphml, write_graphml

GRAPHML_WEIGHTED_DIRECTED = """<?xml version="1.0" encoding="UTF-8"?>
<graphml xmlns="http://graphml.graphdrawing.org/xmlns">
  <key for="edge" id="w" attr.name="weight" attr.type="double"/>
  <graph id="G" edgedefault="directed">
    <node id="a"/>
    <node id="b"/>
    <node id="c"/>
    <edge source="a" target="b"><data key="w">2.5</data></edge>
    <edge source="b" target="c"/>
  </graph>
</graphml>
"""

GRAPHML_PLAIN = """<?xml version="1.0" encoding="UTF-8"?>
<graphml>
  <graph edgedefault="undirected">
    <node id="n0"/>
    <node id="n1"/>
    <edge source="n0" target="n1"/>
  </graph>
</graphml>
"""


def test_read_weighted_directed(spark, tmp_path):
    p = str(tmp_path / "g.graphml")
    with open(p, "w") as fh:
        fh.write(GRAPHML_WEIGHTED_DIRECTED)
    g = read_graphml(spark, p)
    assert g.directed and g.weighted
    assert g.num_vertices() == 3
    rows = {(r.src, r.dst): r.weight for r in g.edges.collect()}
    # document-order ids: a=0 b=1 c=2; missing <data> defaults to 1.0
    assert rows == {(0, 1): 2.5, (1, 2): 1.0}


def test_read_plain_undirected(spark, tmp_path):
    p = str(tmp_path / "p.graphml")
    with open(p, "w") as fh:
        fh.write(GRAPHML_PLAIN)
    g = read_graphml(spark, p)
    assert not g.directed and not g.weighted
    assert g.num_vertices() == 2
    assert g.num_edges() == 1


def test_roundtrip(spark, tmp_path):
    p1 = str(tmp_path / "a.graphml")
    with open(p1, "w") as fh:
        fh.write(GRAPHML_WEIGHTED_DIRECTED)
    g = read_graphml(spark, p1)
    p2 = str(tmp_path / "b.graphml")
    write_graphml(g, p2)
    g2 = read_graphml(spark, p2)
    assert g2.directed and g2.weighted
    assert sorted(map(tuple, g.edges.collect())) == sorted(
        map(tuple, g2.edges.collect())
    )


def test_sniffing_dispatch(spark, tmp_path):
    # extension-less file sniffed by the <graphml base element
    p = str(tmp_path / "mystery.xml")
    with open(p, "w") as fh:
        fh.write(GRAPHML_PLAIN)
    g = read_graph(spark, p)
    assert g.num_vertices() == 2
