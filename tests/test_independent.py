"""Luby MIS (cpp/independentset/Luby.cpp) — the reference's own test
contract is IndependentSetFinder::isIndependentSet (LubyGTest); maximality
follows from the removal rule. Plus determinism (seeded-hash draws)."""

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.independent import (
    is_independent_set,
    is_maximal_independent_set,
    luby_independent_set,
)

from tests.fixtures import F1_EDGES, F1_N, F2_EDGES, F2_N, erdos_renyi


def _mis_checks(spark, edges, n=None):
    g = Graph.from_pairs(spark, edges, directed=False, n=n)
    res = luby_independent_set(g, seed=3)
    members = res.members
    assert is_independent_set(g, members)
    assert is_maximal_independent_set(g, members)
    return g, res


def test_luby_f1_components_graph(spark):
    g, res = _mis_checks(spark, F1_EDGES, n=F1_N)
    ids = {r.id for r in res.members.collect()}
    assert 15 in ids  # isolated node is always in any MIS


def test_luby_f2_dense(spark):
    _mis_checks(spark, F2_EDGES, n=F2_N)


def test_luby_er_property(spark):
    _mis_checks(spark, erdos_renyi(60, 0.1, seed=5))


def test_luby_deterministic(spark):
    edges = erdos_renyi(40, 0.15, seed=9)
    g = Graph.from_pairs(spark, edges, directed=False)
    a = sorted(r.id for r in luby_independent_set(g, seed=7).members.collect())
    b = sorted(r.id for r in luby_independent_set(g, seed=7).members.collect())
    assert a == b
    c = sorted(r.id for r in luby_independent_set(g, seed=8).members.collect())
    assert a != c or len(a) > 0  # different seed may differ; same seed must not


def test_luby_rejects_directed(spark):
    g = Graph.from_pairs(spark, [(0, 1)], directed=True)
    with pytest.raises(ValueError):
        luby_independent_set(g)


def test_luby_star_picks_leaves_or_center(spark):
    # star K1,5: MIS is either {center} or all leaves
    edges = [(0, i) for i in range(1, 6)]
    g, res = _mis_checks(spark, edges)
    ids = sorted(r.id for r in res.members.collect())
    assert ids == [0] or ids == [1, 2, 3, 4, 5]
