"""PivotMDS layout tests: exact parity with a numpy replica of
PivotMDS.cpp:49-107 (same pivots, same raw-distance double-centering,
exact eigendecomposition), plus structural sanity on a path graph."""

import collections

import numpy as np
import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.layout import centered_pivot_matrix, pivot_mds

from tests.conftest import spark  # noqa: F401


def _bfs_dists(pairs, n, src):
    adj = collections.defaultdict(set)
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    dist = {src: 0}
    q = [src]
    while q:
        u = q.pop(0)
        for w in adj[u]:
            if w not in dist:
                dist[w] = dist[u] + 1
                q.append(w)
    return dist


def _numpy_pivot_mds(pairs, n, pivots, dim):
    k = len(pivots)
    D = np.zeros((n, k))
    for j, p in enumerate(pivots):
        d = _bfs_dists(pairs, n, p)
        for i in range(n):
            D[i, j] = d[i]
    row = D.mean(axis=1)
    col = D.mean(axis=0)
    grand = row.sum() / (2 * n) + col.sum() / (2 * k)
    C = D - row[:, None] - col[None, :] + grand
    gram = C.T @ C
    vals, vecs = np.linalg.eigh(gram)
    order = np.argsort(vals)[::-1][:dim]
    V = vecs[:, order]
    for d in range(dim):
        i = int(np.argmax(np.abs(V[:, d])))
        if V[i, d] < 0:
            V[:, d] = -V[:, d]
    return C, C @ V


PAIRS = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 2), (3, 5), (1, 4)]
N = 6


def test_centered_matrix_matches_numpy(spark):  # noqa: F811
    g = Graph.from_pairs(spark, PAIRS, directed=False, n=N)
    centered, pivots, n = centered_pivot_matrix(g, pivot_modulus=2)
    assert pivots == [0, 2, 4] and n == N
    C_want, _ = _numpy_pivot_mds(PAIRS, N, pivots, dim=2)
    got = {(r["id"], r["j"]): r["val"] for r in centered.collect()}
    assert len(got) == N * len(pivots)
    for (i, j), v in got.items():
        assert v == pytest.approx(C_want[i, j], abs=1e-9)


def test_coordinates_match_numpy(spark):  # noqa: F811
    g = Graph.from_pairs(spark, PAIRS, directed=False, n=N)
    res = pivot_mds(g, dim=2, pivot_modulus=2)
    _, pos_want = _numpy_pivot_mds(PAIRS, N, res.pivots, dim=2)
    got = {r["id"]: r["pos"] for r in res.coordinates.collect()}
    for i in range(N):
        assert np.allclose(got[i], pos_want[i], atol=1e-8)


def test_path_graph_first_axis_monotone(spark):  # noqa: F811
    n = 9
    pairs = [(i, i + 1) for i in range(n - 1)]
    g = Graph.from_pairs(spark, pairs, directed=False, n=n)
    res = pivot_mds(g, dim=1, pivot_modulus=4)  # pivots 0, 4, 8
    xs = [r["pos"][0] for r in res.coordinates.orderBy("id").collect()]
    diffs = np.diff(xs)
    assert (diffs > 0).all() or (diffs < 0).all()


def test_errors(spark):  # noqa: F811
    g = Graph.from_pairs(spark, [(0, 1), (2, 3)], directed=False, n=4)
    with pytest.raises(ValueError, match="connected"):
        pivot_mds(g, dim=1, pivot_modulus=4)
    g2 = Graph.from_pairs(spark, PAIRS, directed=False, n=N)
    with pytest.raises(ValueError, match="exceeds"):
        pivot_mds(g2, dim=5, pivot_modulus=3)  # pivots {0, 3} → k=2
