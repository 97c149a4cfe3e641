"""AllSimplePaths vs exhaustive pure-Python DFS enumeration."""

import itertools
import random

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.simplepaths import all_simple_paths


def py_paths(edges, s, t, cutoff):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = []

    def rec(path):
        cur = path[-1]
        if cur == t:
            out.append(tuple(path))
            return
        if len(path) > cutoff:
            return
        for w in sorted(adj.get(cur, ())):
            if w not in path:
                rec(path + [w])

    rec([s])
    return {p for p in out if len(p) - 1 <= cutoff}


@pytest.mark.parametrize("seed,cutoff", [(1, 3), (5, 4)])
def test_matches_exhaustive(spark, seed, cutoff):
    rng = random.Random(seed)
    n = 14
    edges = sorted({(i, j) for i in range(n) for j in range(i + 1, n)
                    if rng.random() < 0.25})
    g = Graph.from_pairs(spark, [(u, v, 1.0) for u, v in edges],
                         directed=False)
    got = {tuple(r["path"]) for r in all_simple_paths(g, 0, 5, cutoff).collect()}
    assert got == py_paths(edges, 0, 5, cutoff)


def test_validation(spark):
    g = Graph.from_pairs(spark, [(0, 1, 1.0)], directed=False)
    with pytest.raises(ValueError):
        all_simple_paths(g, 0, 0, 2)
    with pytest.raises(ValueError):
        all_simple_paths(g, 0, 9, 2)
    with pytest.raises(ValueError):
        all_simple_paths(g, 0, 1, 0)
