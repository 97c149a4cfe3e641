"""DibaP (.gi) binary reader: synthesized round-trip fixture exercising
every section of the layout (magic, vertex weights, CSR adjacency,
edge weights, coordinates, duplicate-edge skip) + the reference's own
airfoil1.gi mesh when present (DibapGraphReader.cpp:32-183)."""

import os
import struct

import numpy as np
import pytest

from networkit_spark.sources.dibap import read_dibap

from tests.conftest import spark  # noqa: F401


def _write_gi(path, v, adj, vw_dim=0, ew=None, coords=None):
    """adj: dict u -> list of neighbors (both directions present, like a
    real CSR file); ew: parallel dict (u -> list of int weights)."""
    out = bytearray()
    out += struct.pack(">h", (ord("G") << 8) | ord("I"))
    out += struct.pack(">i", v)
    out += struct.pack(">i", vw_dim)
    if vw_dim:
        out += struct.pack(f">{v * vw_dim}i", *([7] * v * vw_dim))
    of = [0]
    to = []
    ews = []
    for u in range(v):
        ns = adj.get(u, [])
        to.extend(ns)
        if ew is not None:
            ews.extend(ew[u])
        of.append(len(to))
    out += struct.pack(f">{v + 1}i", *of)
    out += struct.pack(f">{len(to)}i", *to)
    out += struct.pack(">i", 1 if ew is not None else 0)
    if ew is not None:
        out += struct.pack(f">{len(ews)}i", *ews)
    out += struct.pack(">i", 2 if coords is not None else 0)
    if coords is not None:
        flat = np.array(
            [c for p in coords for c in p], dtype="=f4"
        )  # floats are written host-endian (raw fread in the reference)
        out += flat.tobytes()
    with open(path, "wb") as fh:
        fh.write(out)


def test_round_trip_unweighted(spark, tmp_path):  # noqa: F811
    # triangle 0-1-2 plus pendant 3
    adj = {0: [1, 2], 1: [0, 2], 2: [0, 1, 3], 3: [2]}
    p = str(tmp_path / "t.gi")
    _write_gi(p, 4, adj)
    r = read_dibap(spark, p)
    assert r.graph.num_vertices() == 4
    got = {
        (rr["src"], rr["dst"])
        for rr in r.graph.edges.filter("src <= dst").collect()
    }
    assert got == {(0, 1), (0, 2), (1, 2), (2, 3)}
    assert not r.graph.weighted and r.coordinates is None


def test_round_trip_weighted_coords_vw(spark, tmp_path):  # noqa: F811
    adj = {0: [1], 1: [0, 2], 2: [1]}
    ew = {0: [5], 1: [5, 9], 2: [9]}
    coords = [(0.0, 0.5), (1.0, 1.5), (2.0, 2.5)]
    p = str(tmp_path / "w.gi")
    _write_gi(p, 3, adj, vw_dim=1, ew=ew, coords=coords)
    r = read_dibap(spark, p)
    w = {
        (rr["src"], rr["dst"]): rr["weight"]
        for rr in r.graph.edges.filter("src <= dst").collect()
    }
    assert w == {(0, 1): 5.0, (1, 2): 9.0}
    pts = {rr["id"]: tuple(rr["pos"]) for rr in r.coordinates.collect()}
    assert pts == {i: coords[i] for i in range(3)}


def test_duplicate_edge_skipped(spark, tmp_path):  # noqa: F811
    # node 0 lists node 1 twice: reference warns and keeps the first
    adj = {0: [1, 1], 1: [0]}
    p = str(tmp_path / "d.gi")
    _write_gi(p, 2, adj)
    r = read_dibap(spark, p)
    assert r.graph.num_edges() == 1


def test_bad_magic_raises(spark, tmp_path):  # noqa: F811
    p = str(tmp_path / "bad.gi")
    with open(p, "wb") as fh:
        fh.write(struct.pack(">h", (ord("X") << 8) | ord("X")))
    with pytest.raises(ValueError, match="bad file structure"):
        read_dibap(spark, p)


AIRFOIL = "/root/reference/input/airfoil1.gi"


@pytest.mark.skipif(not os.path.exists(AIRFOIL), reason="fixture absent")
def test_airfoil_mesh(spark):  # noqa: F811
    # known mesh: 4253 nodes, 12289 edges, 2-d coordinates (the METIS
    # twin input/airfoil1.graph carries the same counts)
    r = read_dibap(spark, AIRFOIL)
    assert r.graph.num_vertices() == 4253
    assert r.graph.num_edges() == 12289
    assert r.coordinates.count() == 4253
