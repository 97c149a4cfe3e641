"""Suitor matching: the classic (no self-floor) synchronous suitor
fixed point equals THE greedy matching over (weight desc, canonical
pair asc) — see the documented substitution in
operators/matching.suitor_matching (the reference's self-floor variant
is processing-order-dependent). Replica = sequential greedy."""

import random

from networkit_spark.graph import Graph
from networkit_spark.operators.matching import (
    local_max_matching,
    suitor_matching,
)


def _seq_suitor(n, edges):
    """Greedy matching over (w desc, u asc, v asc) — the unique
    locally-dominant matching the suitor fixed point converges to."""
    matched = set()
    out = set()
    for (u, v), w in sorted(edges.items(), key=lambda kv: (-kv[1], kv[0])):
        if u not in matched and v not in matched:
            matched.update((u, v))
            out.add((u, v))
    return out


def _random_weighted(n, p, seed, tie_prone):
    rng = random.Random(seed)
    edges = {}
    for u in range(n):
        for v in range(u + 1, n):
            if rng.random() < p:
                w = float(rng.randint(1, 4)) if tie_prone else rng.random() + 0.5
                edges[(u, v)] = w
    return edges


def _run_spark(spark, n, edges):
    g = Graph.from_pairs(
        spark,
        [(u, v, w) for (u, v), w in edges.items()],
        directed=False,
        n=n,
        weighted=True,
    )
    return {
        (r["u"], r["v"]) for r in suitor_matching(g).collect()
    }, g


def test_suitor_matches_sequential_unique_weights(spark):
    n = 18
    edges = _random_weighted(n, 0.3, seed=7, tie_prone=False)
    got, _ = _run_spark(spark, n, edges)
    assert got == _seq_suitor(n, edges)


def test_suitor_matches_sequential_with_ties(spark):
    n = 16
    edges = _random_weighted(n, 0.35, seed=11, tie_prone=True)
    got, _ = _run_spark(spark, n, edges)
    assert got == _seq_suitor(n, edges)


def test_suitor_equals_local_max_total_order(spark):
    # both resolve ties by (weight desc, canonical pair asc) => same
    # greedy matching
    n = 15
    edges = _random_weighted(n, 0.3, seed=3, tie_prone=True)
    got, g = _run_spark(spark, n, edges)
    lm = {(r["u"], r["v"]) for r in local_max_matching(g).collect()}
    assert got == lm


def test_suitor_is_valid_and_maximal(spark):
    n = 14
    edges = _random_weighted(n, 0.4, seed=5, tie_prone=True)
    got, _ = _run_spark(spark, n, edges)
    seen = set()
    for u, v in got:
        assert (u, v) in edges
        assert u not in seen and v not in seen
        seen.update((u, v))
    for u, v in edges:
        assert u in seen or v in seen, "matching not maximal"
