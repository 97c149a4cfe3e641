"""Electrical centralities — numpy pseudo-inverse oracles for the
exact paths, closed forms on cycle/lollipop, JL-style lax bounds for
the embedding approximations, and the exact-cap raise."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators import electrical as el
from tests.conftest import spark  # noqa: F401
from tests.test_commutetime import _connected_er


def _lplus(n, und_pairs):
    L = np.zeros((n, n))
    for u, v in und_pairs:
        L[u, u] += 1
        L[v, v] += 1
        L[u, v] -= 1
        L[v, u] -= 1
    return np.linalg.pinv(L)


def test_spanning_edge_exact_matches_pinv(spark):  # noqa: F811
    g, und = _connected_er(spark, 18, 0.3, seed=6)
    Li = _lplus(18, und)
    got = {(r["u"], r["v"]): r["score"]
           for r in el.spanning_edge_centrality(g).collect()}
    assert set(got) == set(und)
    for (u, v), s in got.items():
        want = Li[u, u] + Li[v, v] - 2 * Li[u, v]
        assert abs(s - want) < 1e-6, ((u, v), s, want)


def test_spanning_edge_cycle_closed_form(spark):  # noqa: F811
    n = 10
    g = Graph.from_pairs(spark, [(i, (i + 1) % n) for i in range(n)],
                         directed=False)
    got = el.spanning_edge_centrality(g).collect()
    assert len(got) == n
    for r in got:
        assert abs(r["score"] - (n - 1) / n) < 1e-8


def test_electrical_closeness_exact_matches_pinv(spark):  # noqa: F811
    g, und = _connected_er(spark, 15, 0.3, seed=11)
    Li = _lplus(15, und)
    tr = Li.trace()
    got = {r["id"]: r["score"]
           for r in el.electrical_closeness(g).collect()}
    for u in range(15):
        want = (15 - 1.0) / (15 * Li[u, u] + tr)
        assert abs(got[u] - want) < 1e-6, (u, got[u], want)


def test_spanning_edge_approx_bound(spark):  # noqa: F811
    g, und = _connected_er(spark, 16, 0.3, seed=2)
    Li = _lplus(16, und)
    got = {(r["u"], r["v"]): r["score"]
           for r in el.spanning_edge_centrality_approx(g, tol=0.3, seed=3)
           .collect()}
    for (u, v), s in got.items():
        want = Li[u, u] + Li[v, v] - 2 * Li[u, v]
        assert abs(s - want) / want < 0.7, ((u, v), s, want)


def test_electrical_closeness_approx_bound(spark):  # noqa: F811
    g, und = _connected_er(spark, 16, 0.3, seed=9)
    Li = _lplus(16, und)
    tr = Li.trace()
    got = {r["id"]: r["score"]
           for r in el.electrical_closeness_approx(g, tol=0.35, seed=4)
           .collect()}
    for u in range(16):
        want = (16 - 1.0) / (16 * Li[u, u] + tr)
        assert abs(got[u] - want) / want < 0.5, (u, got[u], want)


def test_exact_cap_raises(spark):  # noqa: F811
    g, _ = _connected_er(spark, 12, 0.3, seed=1)
    old = el._EXACT_CAP
    el._EXACT_CAP = 4
    try:
        with pytest.raises(ValueError, match="approx"):
            el.spanning_edge_centrality(g)
        with pytest.raises(ValueError, match="approx"):
            el.electrical_closeness(g)
    finally:
        el._EXACT_CAP = old


def test_forest_centrality_matches_inverse(spark):  # noqa: F811
    g, und = _connected_er(spark, 14, 0.3, seed=12)
    L = np.zeros((14, 14))
    for u, v in und:
        L[u, u] += 1
        L[v, v] += 1
        L[u, v] -= 1
        L[v, u] -= 1
    Om = np.linalg.inv(np.eye(14) + L)
    tr = Om.trace()
    got = {r["id"]: r["score"]
           for r in el.forest_centrality(g).collect()}
    for u in range(14):
        want = 14.0 / (14 * Om[u, u] + tr - 2.0)
        assert abs(got[u] - want) < 1e-6, (u, got[u], want)


def test_forest_centrality_disjoint_cliques(spark):  # noqa: F811
    # forest-matrix diagonal of K_c is exactly 2/(c+1); two disjoint
    # cliques give a closed-form, non-uniform score vector
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(10 + i, 10 + j) for i in range(3) for j in range(i + 1, 3)]
    g = Graph.from_pairs(spark, edges, directed=False)
    got = {r["id"]: r["score"]
           for r in el.forest_centrality(g).collect()}
    n = 8
    tr = 5 * (2.0 / 6.0) + 3 * (2.0 / 4.0)
    for u in range(5):
        want = n / (n * (2.0 / 6.0) + tr - 2.0)
        assert abs(got[u] - want) < 1e-8
    for u in (10, 11, 12):
        want = n / (n * (2.0 / 4.0) + tr - 2.0)
        assert abs(got[u] - want) < 1e-8
