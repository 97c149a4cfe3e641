"""ForestFireScore — exact pure-Python replay of the distributed burn
process (same hash draws, same BSP winner rule) plus the reference's
score-vector contract (ForestFireGTest.cpp:16-31) and normalization
properties."""

import math
from collections import Counter

from pyspark.sql import functions as F

from networkit_spark.generators import erdos_renyi
from networkit_spark.graph import Graph
from networkit_spark.operators.forestfire import forest_fire_scores

from tests.conftest import spark  # noqa: F401

M = 1_000_000_007
A, B, C, D = 2654435761, 40503, 97, 1000003
STEP = 1315423911


def _h3(fire, node, cand, step, seed):
    h1 = (fire * A + node * B + cand * C + step * STEP + seed * D) % M
    h2 = (h1 * h1 + A * h1 + B) % M
    return (h2 * h2 + C * h2 + D) % M


def _uff(fire, node, cand, step, seed):
    return (_h3(fire, node, cand, step, seed) + 1) / (M + 1)


def _geom(fire, node, step, seed, pf):
    if pf == 0.5:
        return math.floor(math.log2((M + 1) // (_h3(fire, node, node, step, seed) + 1)))
    return math.floor(
        math.log(_uff(fire, node, node, step, seed)) / math.log(pf)
    )


def _replica_counts(adj, ids, n_fires, pf, max_steps, seed):
    n = len(ids)
    burnt = Counter()
    for f in range(n_fires):
        start = ids[math.floor(_uff(f, 0, 0, 0, seed) * n)]
        visited = set()
        active = [start]
        for step in range(1, max_steps + 1):
            props = []
            for node in active:
                cands = [x for x in adj.get(node, ()) if x not in visited]
                if not cands:
                    continue
                k = min(_geom(f, node, step, seed, pf), len(cands))
                ranked = sorted(cands, key=lambda x: (_uff(f, node, x, step, seed), x))
                for x in ranked[:k]:
                    props.append((_uff(f, node, x, step, seed), node, x))
            best = {}
            for d, node, x in props:
                if x not in best or (d, node) < best[x]:
                    best[x] = (d, node)
            if not best:
                break
            for x, (_, node) in best.items():
                burnt[(min(node, x), max(node, x))] += 1
                visited.add(x)
            active = sorted(best)
    return burnt


def _setup(spark, n, p, seed):
    edges = erdos_renyi(spark, n, p, seed=seed)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(n))
    adj = {}
    und = set()
    for r in g.simple_undirected_edges().select("u", "v").collect():
        u, v = r["u"], r["v"]
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
        und.add((u, v))
    ids = sorted(r["id"] for r in g.vertices().collect())
    return g, adj, und, ids


def test_fixed_fires_exact_replay(spark):  # noqa: F811
    g, adj, und, ids = _setup(spark, 30, 0.15, 5)
    want = _replica_counts(adj, ids, n_fires=40, pf=0.6, max_steps=8, seed=3)
    mx = max(want.values()) if want else 0
    got = {
        (r["u"], r["v"]): r["score"]
        for r in forest_fire_scores(
            g, pf=0.6, seed=3, n_fires=40, max_steps=8
        ).collect()
    }
    assert set(got) == und
    assert mx > 0, "fixture burnt nothing — pick different params"
    for e in und:
        assert abs(got[e] - want.get(e, 0) / mx) < 1e-12, e


def test_fixed_fires_exact_replay_pf_half(spark):  # noqa: F811
    # pf = 0.5 takes the integer-exact geometric path (the driver-oracle
    # configuration) — replay must still be bit-exact.
    g, adj, und, ids = _setup(spark, 30, 0.15, 5)
    want = _replica_counts(adj, ids, n_fires=48, pf=0.5, max_steps=6, seed=7)
    mx = max(want.values()) if want else 0
    got = {
        (r["u"], r["v"]): r["score"]
        for r in forest_fire_scores(
            g, pf=0.5, seed=7, n_fires=48, max_steps=6
        ).collect()
    }
    assert mx > 0
    for e in und:
        assert abs(got[e] - want.get(e, 0) / mx) < 1e-12, e


def test_score_contract(spark):  # noqa: F811
    # ForestFireGTest.cpp:16-31: one score per edge; plus normalization.
    g, adj, und, ids = _setup(spark, 25, 0.2, 9)
    res = forest_fire_scores(g, pf=0.5, target_burnt_ratio=0.3, seed=1,
                             fires_per_batch=16, max_steps=8).collect()
    assert len(res) == len(und)
    scores = [r["score"] for r in res]
    assert all(0.0 <= s <= 1.0 for s in scores)
    assert max(scores) == 1.0


def test_target_ratio_reached(spark):  # noqa: F811
    g, adj, und, ids = _setup(spark, 25, 0.2, 9)
    from networkit_spark.operators.forestfire import _burn_batch  # noqa: F401

    # high pf burns aggressively: the batched loop must stop only after
    # total burns >= ratio * m (or the batch cap).
    res = forest_fire_scores(g, pf=0.7, target_burnt_ratio=0.5, seed=2,
                             fires_per_batch=8, max_steps=16, max_batches=32)
    burnt_edges = res.filter(F.col("score") > 0).count()
    assert burnt_edges > 0
