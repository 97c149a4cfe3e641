"""Graph file-format readers/writers (EdgeList / SNAP / METIS / Partition)."""

import os

from networkit_spark.operators.components import connected_components
from networkit_spark.sources.edgelist import (
    read_edge_list,
    read_metis,
    read_partition,
    read_snap,
    write_edge_list,
    write_partition,
)


def test_edge_list_roundtrip(spark, tmp_path):
    p = tmp_path / "g.edgelist"
    p.write_text("# comment\n0 1\n1 2\n2 0\n")
    g = read_edge_list(spark, str(p), directed=False)
    assert g.num_vertices() == 3 and g.num_edges() == 3
    assert not g.weighted

    out = str(tmp_path / "out")
    write_edge_list(g, out)
    g2 = read_edge_list(spark, out, separator="\t", directed=False)
    assert g2.num_edges() == 3


def test_edge_list_weighted_autodetect(spark, tmp_path):
    """3rd column = weight, auto-detected (EdgeListReader.cpp:143-152)."""
    p = tmp_path / "w.edgelist"
    p.write_text("0 1 2.5\n1 2 0.5\n")
    g = read_edge_list(spark, str(p), directed=True)
    assert g.weighted
    assert abs(g.total_edge_weight() - 3.0) < 1e-12


def test_edge_list_noncontinuous_remap(spark, tmp_path):
    p = tmp_path / "nc.edgelist"
    p.write_text("100 200\n200 350\n")
    g = read_edge_list(spark, str(p), directed=False, continuous=False)
    ids = sorted(r["id"] for r in g.vertices().collect())
    assert ids == [0, 1, 2]


def test_edge_list_first_node(spark, tmp_path):
    """firstNode=1 shifts 1-based ids to 0-based (EdgeListReader option)."""
    p = tmp_path / "f.edgelist"
    p.write_text("1 2\n2 3\n")
    g = read_edge_list(spark, str(p), directed=False, first_node=1)
    ids = sorted(r["id"] for r in g.vertices().collect())
    assert ids == [0, 1, 2]


def test_snap(spark, tmp_path):
    p = tmp_path / "g.snap"
    p.write_text("# Directed graph\n# FromNodeId\tToNodeId\n0\t1\n1\t2\n")
    g = read_snap(spark, str(p), directed=True)
    assert g.num_edges() == 2


def test_metis(spark, tmp_path):
    """karate-style METIS: header 'n m', 1-based neighbor lists."""
    p = tmp_path / "g.graph"
    # triangle 0-1-2 plus isolated node 3
    p.write_text("4 3\n2 3\n1 3\n1 2\n\n")
    g = read_metis(spark, str(p))
    assert g.num_vertices() == 4
    assert g.num_edges() == 3
    res = connected_components(g)
    assert res.number_of_components() == 2  # triangle + isolated


def test_partition_roundtrip(spark, tmp_path):
    p = tmp_path / "labels.ptn"
    p.write_text("0\n0\n1\n1\n")
    labels = read_partition(spark, str(p))
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: 1}
    out = str(tmp_path / "labels_out")
    write_partition(labels, out)
    back = read_partition(spark, out)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in labels.collect()}


def test_konect_sym_and_asym(spark, tmp_path):
    from networkit_spark.sources.edgelist import read_konect

    p_sym = str(tmp_path / "k_sym.tsv")
    with open(p_sym, "w") as fh:
        fh.write("% sym unweighted\n% 3 3\n1 2\n2 3\n1 3\n")
    g = read_konect(spark, p_sym)
    assert not g.directed
    assert g.num_edges() == 3

    p_asym = str(tmp_path / "k_asym.tsv")
    with open(p_asym, "w") as fh:
        fh.write("% asym positive\n1 2 2.5\n2 1 1.0\n")
    g2 = read_konect(spark, p_asym)
    assert g2.directed and g2.weighted
    w = {(r.src, r.dst): r.weight for r in g2.edges.collect()}
    assert w == {(1, 2): 2.5, (2, 1): 1.0}


# ---------------------------------------------------------------- r2.9
def test_metis_writer_roundtrip(spark, tmp_path):
    """METISGraphWriter: header 'n m w', 1-based adjacency lines — the
    engine's own read_metis recovers the exact graph."""
    from networkit_spark.graph import Graph
    from networkit_spark.sources.edgelist import write_metis

    g = Graph.from_pairs(
        spark, [(0, 1), (1, 2), (2, 0), (2, 3)], directed=False, n=5
    )
    out = str(tmp_path / "m")
    write_metis(g, out)
    txt = [
        line
        for part in sorted(os.listdir(out))
        if part.startswith("part-")
        for line in open(os.path.join(out, part)).read().splitlines()
    ]
    assert txt[0] == "5 4 0"
    assert len(txt) == 6  # header + one line per node, isolated = empty
    assert txt[1].split() == ["2", "3"]  # node 0 -> {1, 2} (1-based)
    assert txt[5] == ""  # node 4 isolated
    g2 = read_metis(spark, out)
    assert g2.num_vertices() == 5 and g2.num_edges() == 4
    same = {
        tuple(sorted(r)) for r in g2.symmetrized_edges().select("src", "dst").collect()
    }
    assert same == {(0, 1), (1, 2), (0, 2), (2, 3)}


def test_metis_writer_weighted_and_directed_raise(spark, tmp_path):
    from networkit_spark.graph import Graph
    from networkit_spark.sources.edgelist import write_metis
    import pytest

    g = Graph.from_pairs(
        spark, [(0, 1, 2.5), (1, 2, 0.5)], directed=False, n=3, weighted=True
    )
    out = str(tmp_path / "mw")
    write_metis(g, out)
    txt = [
        line
        for part in sorted(os.listdir(out))
        if part.startswith("part-")
        for line in open(os.path.join(out, part)).read().splitlines()
    ]
    assert txt[0] == "3 2 1"
    assert txt[1].split() == ["2", "2.5"]
    dg = Graph.from_pairs(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError):
        write_metis(dg, str(tmp_path / "bad"))


def test_snap_writer_roundtrip(spark, tmp_path):
    """SNAPGraphWriter problem line + edge lines; read_snap recovers the
    edge set."""
    from networkit_spark.graph import Graph
    from networkit_spark.sources.edgelist import write_snap

    g = Graph.from_pairs(spark, [(0, 1), (1, 2), (3, 1)], directed=False, n=4)
    out = str(tmp_path / "s")
    write_snap(g, out)
    txt = [
        line
        for part in sorted(os.listdir(out))
        if part.startswith("part-")
        for line in open(os.path.join(out, part)).read().splitlines()
    ]
    assert txt[0] == "p 4 3 u u 0"
    assert txt[1:] == ["0 1", "1 2", "1 3"]
