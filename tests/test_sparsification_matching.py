"""Sparsification edge scores (SCAN / Jaccard / local-degree / threshold
filter) and local-max matching vs a greedy oracle."""

import math

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.matching import local_max_matching
from networkit_spark.operators.sparsification import (
    global_threshold_filter,
    jaccard_distances,
    jaccard_similarity_scores,
    local_degree_scores,
    scan_similarity_scores,
)
from tests.fixtures import F2_EDGES, F2_N, erdos_renyi

# F2 (GlobalGTest 6-node graph): degrees 1:4, 2:4, 0:1, 3:3, 4:2, 5:2;
# per-edge triangle counts known from test_triangles goldens.


def _by_edge(df, col):
    return {(r["u"], r["v"]): r[col] for r in df.collect()}


def _tri_deg_oracle(n, edges):
    nbrs = {v: set() for v in range(n)}
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    out = {}
    for u, v in edges:
        t = len(nbrs[u] & nbrs[v])
        out[(min(u, v), max(u, v))] = (t, len(nbrs[u]), len(nbrs[v]))
    return out


def test_scan_and_jaccard_formulas(spark):
    g = Graph.from_pairs(spark, F2_EDGES, directed=False, n=F2_N)
    oracle = _tri_deg_oracle(F2_N, F2_EDGES)
    scan = _by_edge(scan_similarity_scores(g), "score")
    jac = _by_edge(jaccard_similarity_scores(g), "score")
    dist = _by_edge(jaccard_distances(g), "distance")
    assert set(scan) == set(oracle)
    for e, (t, du, dv) in oracle.items():
        assert scan[e] == pytest.approx((t + 1) / math.sqrt((du + 1) * (dv + 1))), e
        assert jac[e] == pytest.approx(t / (du + dv - t)), e
        assert dist[e] == pytest.approx(1 - t / (du + dv - t)), e


def test_local_degree_score_hand(spark):
    """Star + chain: hub 0 with leaves 1..3 and 1-4. Node 0 (d=3):
    neighbor degrees 1:2, 2:1, 3:1 → ranks 1, 2, 2 →
    e = 1, 1−log2/log3, 1−log2/log3. Node 1 (d=2): neighbors 0 (deg 3,
    rank 1 → e=1), 4 (deg 1, rank 2 → e=1−log2/log2=0). Leaves d=1 →
    e=1. Edge score = max over views."""
    edges = [(0, 1), (0, 2), (0, 3), (1, 4)]
    g = Graph.from_pairs(spark, edges, directed=False)
    got = _by_edge(local_degree_scores(g), "score")
    e_tie = 1.0 - math.log(2) / math.log(3)
    assert got[(0, 1)] == pytest.approx(1.0)  # rank-1 from node 0's view
    assert got[(0, 2)] == pytest.approx(max(e_tie, 1.0))  # leaf view d=1 → 1
    assert got[(1, 4)] == pytest.approx(1.0)  # leaf 4's view


def test_global_threshold_filter(spark):
    g = Graph.from_pairs(spark, F2_EDGES, directed=False, n=F2_N)
    scores = jaccard_similarity_scores(g)
    kept = global_threshold_filter(g, scores, 0.4, above=True)
    want = {e for e, s in _by_edge(scores, "score").items() if s >= 0.4}
    got = {
        (r["u"], r["v"])
        for r in kept.simple_undirected_edges().collect()
    }
    assert got == want
    assert kept.num_vertices() == F2_N  # vertex set preserved


def _greedy_matching(wedges):
    used, chosen = set(), set()
    for u, v, w in sorted(wedges, key=lambda e: (-e[2], min(e[0], e[1]), max(e[0], e[1]))):
        if u not in used and v not in used and u != v:
            used.add(u)
            used.add(v)
            chosen.add((min(u, v), max(u, v)))
    return chosen


def test_matching_unique_weights_equals_greedy(spark):
    edges = erdos_renyi(26, 0.18, seed=41)
    wedges = [(u, v, float((u * 53 + v * 97) % 1009) + 1.0) for u, v in edges]
    g = Graph.from_pairs(spark, wedges, directed=False, n=26, weighted=True)
    got = {(r["u"], r["v"]) for r in local_max_matching(g).collect()}
    assert got == _greedy_matching(wedges)


def test_matching_valid_and_maximal(spark):
    """Uniform weights: result must still be a valid MAXIMAL matching."""
    edges = erdos_renyi(30, 0.12, seed=6)
    g = Graph.from_pairs(spark, edges, directed=False, n=30)
    rows = local_max_matching(g).collect()
    seen = set()
    for r in rows:
        assert r["u"] not in seen and r["v"] not in seen
        seen.add(r["u"])
        seen.add(r["v"])
    # maximality: every graph edge touches a matched vertex
    for u, v in edges:
        assert u in seen or v in seen, (u, v)


def test_adamic_adar_oracle(spark):
    from networkit_spark.operators.sparsification import (
        adamic_adar_distances,
        adamic_adar_scores,
    )

    edges = erdos_renyi(24, 0.2, seed=19)
    g = Graph.from_pairs(spark, edges, directed=False, n=24)
    nbrs = {v: set() for v in range(24)}
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    got = _by_edge(adamic_adar_scores(g), "score")
    dist = _by_edge(adamic_adar_distances(g), "distance")
    assert set(got) == {(min(u, v), max(u, v)) for u, v in edges}
    for (u, v), s in got.items():
        want = sum(1.0 / math.log(len(nbrs[w])) for w in nbrs[u] & nbrs[v])
        assert s == pytest.approx(want, abs=1e-9), (u, v)
        if want > 0:
            assert dist[(u, v)] == pytest.approx(1.0 / want)
        else:
            assert math.isinf(dist[(u, v)])


# ------------------------------------------------- round-2.4 score family
def test_local_similarity_hand(spark):
    import math

    from networkit_spark.operators.sparsification import local_similarity_scores

    # triangle 0-1-2 plus pendant 2-3
    g = Graph.from_pairs(
        spark, [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (2, 3, 1.0)],
        directed=False)
    got = {(r["u"], r["v"]): r["score"]
           for r in local_similarity_scores(g).collect()}
    # node 2 (deg 3): sims — (0,2): 1/(2+3-1)=0.25, (1,2): 0.25, (2,3): 0/(3+1)=0
    # ranks at node 2: (0,2)->1, (1,2)->2, (2,3)->3
    e_12_at2 = 1 - math.log(2) / math.log(3)
    e_23_at2 = 1 - math.log(3) / math.log(3)
    assert abs(got[(2, 3)] - max(e_23_at2, 1.0)) < 1e-12  # deg(3)=1 side wins
    assert abs(got[(0, 1)] - 1.0) < 1e-12  # rank 1 at both endpoints
    # at node 1, sim(0,1)=1/3 beats sim(1,2)=1/4 -> (1,2) is rank 2 there
    # (e = 1 - ln2/ln2 = 0); node 2's rank-2 value wins the max
    assert abs(got[(1, 2)] - e_12_at2) < 1e-12


def test_multiscale_and_chance_hand(spark):
    from networkit_spark.operators.sparsification import (
        chance_corrected_triangle_scores,
        multiscale_scores,
    )

    g = Graph.from_pairs(
        spark, [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (2, 3, 1.0)],
        directed=False)
    ms = {(r["u"], r["v"]): r["score"] for r in multiscale_scores(g).collect()}
    # at node 3 (deg 1): p=1, prob=1-(1-1)^0=0 -> max comes from node 2:
    # p=1/3, d=3: 1-(2/3)^2 = 5/9
    assert abs(ms[(2, 3)] - 5.0 / 9.0) < 1e-12
    # at node 0 (deg 2): p=1/2: 1-(1/2)^1 = 0.5; node 1 same -> 0.5
    assert abs(ms[(0, 1)] - 0.5) < 1e-12

    ct = {(r["u"], r["v"]): r["score"]
          for r in chance_corrected_triangle_scores(g).collect()}
    n = 4
    # edge (0,1): T=1, deg 2/2 -> 1*(n-2)/(1*1) = 2
    assert abs(ct[(0, 1)] - 2.0) < 1e-12
    # edge (1,2): T=1, deg 2/3 -> 2/(1*2) = 1
    assert abs(ct[(1, 2)] - 1.0) < 1e-12
    # pendant (2,3): T=0, deg(3)=1 -> 1
    assert abs(ct[(2, 3)] - 1.0) < 1e-12


def test_sparsifier_wrappers(spark):  # noqa: F811
    """Sparsifiers.cpp wrapper family: each = its score pass +
    GlobalThresholdFilter(above=True); checked against composing the
    two halves by hand, plus containment/monotonicity contracts."""
    from networkit_spark.generators import erdos_renyi
    from networkit_spark.operators.sparsification import (
        global_threshold_filter,
        local_similarity_scores,
        local_similarity_sparsifier,
        multiscale_scores,
        multiscale_sparsifier,
        random_sparsifier,
        simmelian_multiscale_sparsifier,
        simmelian_sparsifier_parametric,
    )

    edges = erdos_renyi(spark, 30, 0.2, seed=5)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(30))

    def canon(gr):
        return sorted(
            (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
            for r in gr.edges.filter(F.col("src") < F.col("dst")).collect()
        )

    m = len(canon(g))

    got = canon(local_similarity_sparsifier(g, 0.6))
    want = canon(global_threshold_filter(
        g, local_similarity_scores(g), 0.6, above=True))
    assert got == want and 0 < len(got) < m

    got = canon(multiscale_sparsifier(g, 0.5))
    want = canon(global_threshold_filter(
        g, multiscale_scores(g), 0.5, above=True))
    assert got == want

    # simmelian multiscale scores triangles, not weights
    sm = canon(simmelian_multiscale_sparsifier(g, 0.5))
    assert set(sm) <= set(canon(g))

    sp = canon(simmelian_sparsifier_parametric(g, max_rank=5, min_overlap=1))
    assert set(sp) <= set(canon(g))

    # random: higher ratio keeps fewer edges; seeded determinism
    r1 = canon(random_sparsifier(g, 0.3, seed=7))
    r2 = canon(random_sparsifier(g, 0.7, seed=7))
    assert set(r2) <= set(r1) and len(r2) < len(r1) < m
    assert r1 == canon(random_sparsifier(g, 0.3, seed=7))
