"""MaxentStress layout tests (MaxentStress.cpp parity properties).

The reference ships only INFO-logged benchmarks for MaxentStress
(MaxentStressGTest.cpp:48-187 — no assertions), so the contract here is
the algorithm's defining properties: stress (ldme over the known-distance
set S) drops materially from the initial layout, the known-distance
table matches the k-hop semantics, the connectivity guard throws, q
auto-switches on degree-1-heavy graphs, and runs are deterministic."""

import math

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.maxentstress import (
    known_distances,
    ldme,
    maxent_stress,
    random_sphere_init,
    scale_layout,
)

from tests.conftest import spark  # noqa: F401


def _grid_pairs(rows, cols):
    pairs = []
    for r in range(rows):
        for c in range(cols):
            u = r * cols + c
            if c + 1 < cols:
                pairs.append((u, u + 1))
            if r + 1 < rows:
                pairs.append((u, u + cols))
    return pairs


def test_known_distances_k1_is_edge_set(spark):  # noqa: F811
    pairs = [(0, 1), (1, 2), (2, 3)]
    g = Graph.from_pairs(spark, pairs, directed=False, n=4)
    s = {(r["src"], r["dst"], r["d"]) for r in known_distances(g, 1).collect()}
    want = set()
    for u, v in pairs:
        want.add((u, v, 1.0))
        want.add((v, u, 1.0))
    assert s == want


def test_known_distances_k2_hops(spark):  # noqa: F811
    # path 0-1-2-3: k=2 adds the hop-2 pairs at distance 2
    g = Graph.from_pairs(spark, [(0, 1), (1, 2), (2, 3)], directed=False, n=4)
    s = {(r["src"], r["dst"]): r["d"] for r in known_distances(g, 2).collect()}
    assert s[(0, 2)] == 2.0 and s[(1, 3)] == 2.0 and s[(0, 1)] == 1.0
    assert (0, 3) not in s  # hop 3 > k


def test_maxent_reduces_stress_on_grid(spark):  # noqa: F811
    g = Graph.from_pairs(spark, _grid_pairs(5, 5), directed=False, n=25)
    init = random_sphere_init(g, dim=2, seed=7)
    s = known_distances(g, 1)
    before = ldme(init, s)
    res = maxent_stress(
        g, dim=2, coordinates=init, max_solves_per_alpha=5, tolerance=1e-6
    )
    scaled, factor = scale_layout(res.coordinates, s)
    after = ldme(scaled, s)
    assert res.coordinates.count() == 25
    assert res.solves >= 1 and res.alpha_rounds >= 1
    # a 5x5 grid lays out near-isometrically; scaled ldme well under the
    # random-sphere start and in absolute terms below half an edge length
    assert after < before
    assert after < 0.5
    assert factor > 0


def test_deterministic(spark):  # noqa: F811
    g = Graph.from_pairs(spark, _grid_pairs(3, 4), directed=False, n=12)
    kw = dict(seed=3, max_solves_per_alpha=2, alpha=0.1, final_alpha=0.05)
    a = maxent_stress(g, dim=2, **kw)
    b = maxent_stress(g, dim=2, **kw)
    ca = {r["id"]: tuple(r["pos"]) for r in a.coordinates.collect()}
    cb = {r["id"]: tuple(r["pos"]) for r in b.coordinates.collect()}
    for i in ca:
        assert all(
            math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)
            for x, y in zip(ca[i], cb[i])
        )


def test_disconnected_raises(spark):  # noqa: F811
    g = Graph.from_pairs(spark, [(0, 1), (2, 3)], directed=False, n=4)
    with pytest.raises(ValueError, match="not connected|isolated"):
        maxent_stress(g, dim=2, max_solves_per_alpha=2)


def test_q_switches_on_star(spark):  # noqa: F811
    # star: 7 of 8 nodes have degree 1 -> q = 0.8 (reference :545-552)
    g = Graph.from_pairs(
        spark, [(0, i) for i in range(1, 8)], directed=False, n=8
    )
    res = maxent_stress(
        g, dim=2, max_solves_per_alpha=2, alpha=0.1, final_alpha=0.05
    )
    assert res.q == 0.8
