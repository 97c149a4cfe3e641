"""Extended LinkPredictor family vs pure-Python replicas of the
reference formulas (AdjustedRandIndex.cpp — with its set_union quirk —
NeighborhoodDistanceIndex/TotalNeighbors/NeighborsMeasure/U-V-Degree
headers, KatzIndex.cpp walk counts, AlgebraicDistanceIndex.cpp)."""

import math

from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.linkprediction import (
    algebraic_distance_index_scores,
    extended_link_prediction_scores,
    katz_index_scores,
    missing_links,
)
from tests.test_commutetime import _connected_er


def _adj(und, n):
    adj = {u: set() for u in range(n)}
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    return adj


def test_extended_indices_match_replica(spark):
    n = 16
    g, und = _connected_er(spark, n, 0.25, seed=21)
    adj = _adj(und, n)
    pairs_df = missing_links(g, 2)
    part = spark.range(n).select(
        "id", (F.col("id") % 3).alias("label")
    )
    got = {
        (r["u"], r["v"]): r
        for r in extended_link_prediction_scores(g, pairs_df, part).collect()
    }
    assert got, "no distance-2 pairs in fixture"
    for (u, v), r in got.items():
        a = len(adj[u] & adj[v])
        uni = len(adj[u] | adj[v])
        b = c = uni  # the reference's set_union quirk
        d = n - uni
        denom = a * b + a * c + 2 * a * d + b * b + b * d + c * c + c * d
        ari = 0.0 if denom == 0 else 2 * (a * d - b * c) / denom
        assert abs(r["adjusted_rand"] - ari) < 1e-12
        nd = a / math.sqrt(len(adj[u]) * len(adj[v]))
        assert abs(r["neighborhood_distance"] - nd) < 1e-12
        assert r["total_neighbors"] == uni
        conn = sum(
            1
            for x in adj[u]
            for y in adj[v]
            if x == y or y in adj[x]
        )
        assert r["neighbors_measure"] == conn
        assert r["u_degree"] == len(adj[u])
        assert r["v_degree"] == len(adj[v])
        assert r["same_community"] == (1.0 if u % 3 == v % 3 else 0.0)


def _katz_ref(adj, u, v, L, damp):
    du, dv = len(adj[u]), len(adj[v])
    start = v if du > dv else u
    end = u if start == v else v
    cnt = {start: 1}
    score = {}
    for length in range(1, L + 1):
        hits = {}
        for cur, c in cnt.items():
            for w in adj[cur]:
                hits[w] = hits.get(w, 0) + c
        for w, h in hits.items():
            score[w] = score.get(w, 0.0) + damp**length * h
        cnt = hits
    return score.get(end, 0.0)


def test_katz_index_matches_replica(spark):
    n = 14
    g, und = _connected_er(spark, n, 0.3, seed=5)
    adj = _adj(und, n)
    pairs_df = missing_links(g, 2)
    got = {
        (r["u"], r["v"]): r["score"]
        for r in katz_index_scores(g, pairs_df, 4, 0.1).collect()
    }
    for (u, v), s in got.items():
        want = _katz_ref(adj, u, v, 4, 0.1)
        assert abs(s - want) < 1e-9, (u, v, s, want)


def test_adi_pair_scores_match_loads(spark):
    from networkit_spark.operators.distances import algebraic_distance_loads

    g, und = _connected_er(spark, 12, 0.3, seed=8)
    pairs_df = missing_links(g, 2)
    loads = {
        (r["id"], r["sys"]): r["load"]
        for r in algebraic_distance_loads(
            g, num_systems=3, num_iters=4, normalize=False
        ).collect()
    }
    for norm in (0, 2):
        got = {
            (r["u"], r["v"]): r["score"]
            for r in algebraic_distance_index_scores(
                g, pairs_df, num_systems=3, num_iters=4, norm=norm
            ).collect()
        }
        for (u, v), s in got.items():
            diffs = [
                abs(loads[(u, k)] - loads[(v, k)]) for k in range(3)
            ]
            want = max(diffs) if norm == 0 else sum(
                x**2 for x in diffs
            ) ** 0.5
            assert abs(s - want) < 1e-12


def test_adi_raw_vs_normalized_loads_differ(spark):
    from networkit_spark.operators.distances import algebraic_distance_loads

    g, _ = _connected_er(spark, 10, 0.35, seed=3)
    raw = algebraic_distance_loads(
        g, num_systems=2, num_iters=2, normalize=False
    ).collect()
    nrm = algebraic_distance_loads(
        g, num_systems=2, num_iters=2, normalize=True
    ).collect()
    rv = {(r["id"], r["sys"]): r["load"] for r in raw}
    nv = {(r["id"], r["sys"]): r["load"] for r in nrm}
    assert any(abs(rv[k] - nv[k]) > 1e-9 for k in rv)
    # normalized loads span [0, 1] per system; raw generally don't hit both
    for s in (0, 1):
        vals = [v for (i, k), v in nv.items() if k == s]
        assert min(vals) == 0.0 and max(vals) == 1.0
