"""Mocnik and PubWeb geometric generators — the edge rules replayed in
python from the operators' own collected coordinates (exact parity),
plus the reference invariants (in-ball placement, torus range, mutual
degree cap, weight formula)."""

import math

from pyspark.sql import functions as F

from networkit_spark.generators import mocnik, mocnik_points, pubweb, pubweb_points

from tests.conftest import spark  # noqa: F401


def test_mocnik_points_in_ball(spark):  # noqa: F811
    pts = mocnik_points(spark, dim=3, n=200, seed=5).collect()
    assert len(pts) == 200
    for r in pts:
        assert sum((r[f"x{j}"] - 0.5) ** 2 for j in range(3)) < 0.25


def test_mocnik_edge_rule_replay(spark):  # noqa: F811
    dim, n, k, seed = 2, 60, 1.5, 9
    pts = {r["id"]: tuple(r[f"x{j}"] for j in range(dim))
           for r in mocnik_points(spark, dim, n, seed).collect()}

    def d2(i, j):
        return sum((pts[i][t] - pts[j][t]) ** 2 for t in range(dim))

    want = set()
    for i in pts:
        dmin2 = min(d2(i, j) for j in pts if j != i)
        for j in pts:
            if i != j and d2(i, j) <= k * k * dmin2:
                want.add((i, j))
    got = {(r["src"], r["dst"])
           for r in mocnik(spark, dim, n, k, seed=seed).collect()}
    assert got == want
    # MocnikGeneratorBasic contract: every node keeps its nearest
    # neighbor (out-degree >= 1), graph directed
    outs = {s for s, _ in got}
    assert outs == set(pts)


def test_mocnik_deterministic(spark):  # noqa: F811
    a = sorted(map(tuple, mocnik(spark, 2, 40, 2.0, seed=3).collect()))
    b = sorted(map(tuple, mocnik(spark, 2, 40, 2.0, seed=3).collect()))
    c = sorted(map(tuple, mocnik(spark, 2, 40, 2.0, seed=4).collect()))
    assert a == b and a != c


def _torus_d2(p, q):
    def t(a, b):
        raw = abs(a - b)
        return min(raw, 1.0 - raw)

    return t(p[0], q[0]) ** 2 + t(p[1], q[1]) ** 2


def test_pubweb_points_contract(spark):  # noqa: F811
    pts = pubweb_points(spark, 300, num_dense_areas=6, seed=11).collect()
    assert len(pts) == 300
    for r in pts:
        assert 0.0 <= r["x"] < 1.0 and 0.0 <= r["y"] < 1.0


def test_pubweb_mutual_topk_replay(spark):  # noqa: F811
    n, areas, rad, mx, seed = 250, 5, 0.12, 4, 7
    pts = {r["id"]: (r["x"], r["y"])
           for r in pubweb_points(spark, n, areas, seed).collect()}
    tops = {}
    for u in pts:
        cand = sorted(
            (( _torus_d2(pts[u], pts[v]), min(u, v), max(u, v), v)
             for v in pts if v != u and _torus_d2(pts[u], pts[v]) <= rad * rad),
        )
        tops[u] = {(c[1], c[2]) for c in cand[:mx]}
    want = {}
    for u in pts:
        for e in tops[u]:
            want[e] = want.get(e, 0) + 1
    want_edges = {e for e, c in want.items() if c == 2}
    got = {(r["src"], r["dst"]): r["weight"]
           for r in pubweb(spark, n, areas, rad, mx, seed=seed).collect()}
    assert set(got) == want_edges
    for (a, b), w in got.items():
        assert abs(w - 0.01 / _torus_d2(pts[a], pts[b])) < 1e-9
    # degree cap: every node appears in at most max_neighbors edges
    deg = {}
    for a, b in got:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert all(d <= mx for d in deg.values())
    assert len(got) > 0


def test_pubweb_clustering(spark):  # noqa: F811
    # dense areas make the in-radius candidate count highly non-uniform:
    # some nodes saturate the neighbor cap, isolated spread nodes do not
    edges = pubweb(spark, 400, num_dense_areas=3, neighborhood_radius=0.08,
                   max_neighbors=6, seed=2)
    deg = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .groupBy("id").agg(F.count("*").alias("d"))
    )
    mx = deg.agg(F.max("d")).first()[0]
    assert mx <= 6
    assert deg.count() < 400  # some nodes stay isolated


def test_mocnik_layers(spark):  # noqa: F811
    """Multi-layer Mocnik (MocnikGenerator.cpp generate()): the base
    layer over ns[0] nodes is exactly the single-layer rule; later
    layers only contribute pairs not already present; weighted mode
    scales dist by relativeWeights."""
    from networkit_spark.generators import mocnik, mocnik_layers

    base = {(r["src"], r["dst"])
            for r in mocnik(spark, 2, 40, 1.5, seed=9).collect()}
    multi = mocnik_layers(spark, 2, [40, 25], [1.5, 3.0], seed=9)
    rows = multi.collect()
    got = {(r["src"], r["dst"]) for r in rows}
    # no duplicate pairs, base layer contained verbatim
    assert len(rows) == len(got)
    assert base <= got
    # extra edges all live inside the second layer's node prefix
    extra = got - base
    assert extra and all(u < 25 and v < 25 for u, v in extra)

    # weighted: every weight is dist * rw of SOME layer; base-layer pairs
    # carry rw=1 distances (< sqrt(dim) bound after scaling)
    wrows = mocnik_layers(spark, 2, [40, 25], [1.5, 3.0],
                          relative_weights=[1.0, 10.0], weighted=True,
                          seed=9).collect()
    wmap = {(r["src"], r["dst"]): r["weight"] for r in wrows}
    assert set(wmap) == got
    for (u, v) in base:
        assert wmap[(u, v)] <= 2.0 ** 0.5  # rw=1, dist inside unit ball
    assert any(w > 2.0 ** 0.5 for (p, w) in wmap.items() if p in extra)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="same length"):
        mocnik_layers(spark, 2, [10, 5], [1.5])
    with _pytest.raises(ValueError, match="k must be > 1"):
        mocnik_layers(spark, 2, [10], [0.5])
