"""Node/edge attribute API — reference Graph.hpp:163-251 parity surface."""

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph


@pytest.fixture
def g(spark):
    return Graph.from_pairs(
        spark, [(0, 1), (1, 2), (2, 0)], directed=False, n=4
    )


def test_attach_set_get(g):
    att = g.attach_node_attribute("color", int)
    att[0] = 7
    att[2] = 9
    assert att[0] == 7
    assert att[2] == 9
    assert att.get(1) is None
    with pytest.raises(ValueError):
        _ = att[1]  # unset index raises, as in the reference
    assert len(att) == 2


def test_attach_duplicate_name_raises(g):
    g.attach_node_attribute("x", float)
    with pytest.raises(ValueError):
        g.attach_node_attribute("x", float)


def test_get_by_name_and_type(g):
    g.attach_node_attribute("score", float)
    att = g.get_node_attribute("score", float)
    att[3] = 0.5
    assert g.get_node_attribute("score", float)[3] == 0.5
    with pytest.raises(ValueError):
        g.get_node_attribute("score", int)  # wrong type
    g.detach_node_attribute("score")
    with pytest.raises(ValueError):
        g.get_node_attribute("score", float)


def test_bulk_set_df(spark, g):
    att = g.attach_node_attribute("deg2", int)
    att.set_df(
        g.out_degrees().select("id", F.col("degree").alias("value"))
    )
    assert len(att) == 4
    assert att[0] == 2  # triangle node


def test_edge_attribute(g):
    att = g.attach_edge_attribute("label", str)
    att[(0, 1)] = "tree"
    assert att[(0, 1)] == "tree"
    att[(0, 1)] = "back"  # upsert replaces
    assert att[(0, 1)] == "back"
    assert len(att) == 1


def test_attribute_write_read(tmp_path, g):
    att = g.attach_node_attribute("w", float)
    att[1] = 2.5
    p = str(tmp_path / "attr.parquet")
    att.write(p)
    att2 = g.attach_node_attribute("w2", float)
    att2.read(p)
    assert att2[1] == 2.5


def test_string_attribute_and_types(g):
    att = g.attach_node_attribute("name", str)
    att[0] = "zero"
    assert att[0] == "zero"
    with pytest.raises(TypeError):
        g.attach_node_attribute("bad", list)
