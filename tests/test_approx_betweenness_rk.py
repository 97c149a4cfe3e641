"""ApproxBetweenness (Riondato-Kornaropoulos path sampling) — exact
pure-python replay of the batched sampler (same hash draws, same
weighted-choice boundary) plus the reference's vd<=2 early-out and the
sample-size formula."""

import math

from networkit_spark.generators import erdos_renyi
from networkit_spark.graph import Graph
from networkit_spark.operators.betweenness import approx_betweenness_rk

from tests.conftest import spark  # noqa: F401

M = 1_000_000_007
A, B, C, D = 2654435761, 40503, 97, 1000003


def _u(walk, pos, cand, seed):
    h1 = (walk * A + pos * B + cand * C + seed * D) % M
    h2 = (h1 * h1 + A * h1 + B) % M
    h3 = (h2 * h2 + C * h2 + D) % M
    return (h3 + 1) / (M + 1)


def _replica(el, ids, r, seed):
    adj = {}
    for a, b in el:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    ids = sorted(ids)
    n = len(ids)
    score = {}
    for i in range(r):
        srk = math.floor(_u(i, 0, 0, seed) * n)
        q = math.floor(_u(i, 1, 0, seed) * (n - 1))
        trk = q + 1 if q >= srk else q
        s, t = ids[srk], ids[trk]
        dist = {s: 0}
        sigma = {s: 1}
        frontier = [s]
        d = 0
        while frontier:
            d += 1
            nxt = {}
            for v in frontier:
                for w in adj.get(v, ()):
                    if w not in dist:
                        nxt[w] = nxt.get(w, 0) + sigma[v]
            for w, sg in nxt.items():
                dist[w] = d
                sigma[w] = sg
            frontier = list(nxt)
        if t not in dist:
            continue
        cur, cd, step = t, dist[t], 0
        while cd > 0:
            step += 1
            preds = sorted(p for p in adj[cur] if dist.get(p) == cd - 1)
            tot = float(sum(sigma[p] for p in preds))
            ud = _u(i, 100 + step, 0, seed)
            cum, pick = 0.0, preds[-1]
            for p in preds:
                cum += sigma[p]
                if cum >= ud * tot:
                    pick = p
                    break
            if pick != s:
                score[pick] = score.get(pick, 0) + 1
            cur, cd = pick, cd - 1
    return {k: v / r for k, v in score.items()}


def test_exact_replay(spark):  # noqa: F811
    edges = erdos_renyi(spark, 40, 0.08, seed=23)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(40))
    el = [(r0["u"], r0["v"])
          for r0 in g.simple_undirected_edges().select("u", "v").collect()]
    want = _replica(el, range(40), r=32, seed=5)
    got = {r0["id"]: r0["score"]
           for r0 in approx_betweenness_rk(g, vd=6, r=32, seed=5).collect()}
    assert len(got) == 40
    for k, v in got.items():
        assert abs(v - want.get(k, 0.0)) < 1e-12, k
    assert sum(1 for v in got.values() if v > 0) > 5


def test_vd_le_2_early_out(spark):  # noqa: F811
    edges = erdos_renyi(spark, 12, 0.9, seed=3)  # near-complete: vd <= 2
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(12))
    res = approx_betweenness_rk(g, epsilon=0.5, vd=2, seed=1).collect()
    assert all(r["score"] == 0.0 for r in res)


def test_sample_size_formula(spark):  # noqa: F811
    # r = ceil((c/eps^2)(floor(log2(vd-2)) + 1 - ln(delta))),
    # ApproxBetweenness.cpp:46
    edges = erdos_renyi(spark, 20, 0.12, seed=7)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(20))
    eps, dlt, vd = 0.6, 0.2, 6
    want_r = math.ceil((1.0 / eps ** 2) * (math.floor(math.log2(vd - 2)) + 1
                                           - math.log(dlt)))
    got = approx_betweenness_rk(g, epsilon=eps, delta=dlt, vd=vd, seed=2)
    want = approx_betweenness_rk(g, r=want_r, vd=vd, seed=2)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
