"""Randomization-module tests — the reference's own invariants
(DegreePreservingShuffleGTest / EdgeSwitchingGTest): the permutation is
valid and degree-preserving, edge switching preserves the exact degree
sequence, keeps the graph simple, and actually changes the edge set;
everything is seed-deterministic."""

import collections

from pyspark.sql import functions as F

from networkit_spark.generators import erdos_renyi
from networkit_spark.graph import Graph
from networkit_spark.operators.randomization import (
    degree_preserving_shuffle,
    edge_switching,
    shuffled_graph,
)

from tests.conftest import spark  # noqa: F401


def _degrees(g: Graph) -> dict:
    return {
        r["id"]: r["d"]
        for r in g.symmetrized_edges()
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("d"))
        .collect()
    }


def test_shuffle_is_degree_class_permutation(spark):  # noqa: F811
    edges = erdos_renyi(spark, 60, 0.12, seed=5)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(60))
    perm = {r["id"]: r["new_id"] for r in degree_preserving_shuffle(g, seed=3).collect()}
    # valid permutation over all 60 ids
    assert sorted(perm) == list(range(60))
    assert sorted(perm.values()) == list(range(60))
    # stays within the degree class
    deg = _degrees(g)
    for a, b in perm.items():
        assert deg.get(a, 0) == deg.get(b, 0)
    # deterministic / seed-sensitive
    again = {r["id"]: r["new_id"] for r in degree_preserving_shuffle(g, seed=3).collect()}
    other = {r["id"]: r["new_id"] for r in degree_preserving_shuffle(g, seed=4).collect()}
    assert perm == again
    assert perm != other


def test_shuffled_graph_preserves_degree_sequence(spark):  # noqa: F811
    edges = erdos_renyi(spark, 50, 0.15, seed=2)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(50))
    g2 = shuffled_graph(g, seed=9)
    assert sorted(_degrees(g).values()) == sorted(_degrees(g2).values())
    assert g2.edges.count() == g.edges.count()


def test_shuffle_directed_uses_degree_pairs(spark):  # noqa: F811
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (0, 3)]
    g = Graph.from_pairs(spark, pairs, directed=True, n=5)
    perm = {r["id"]: r["new_id"] for r in degree_preserving_shuffle(g, seed=1).collect()}
    out_d = collections.Counter(u for u, _ in pairs)
    in_d = collections.Counter(v for _, v in pairs)
    for a, b in perm.items():
        assert (in_d.get(a, 0), out_d.get(a, 0)) == (in_d.get(b, 0), out_d.get(b, 0))


def test_edge_switching_invariants(spark):  # noqa: F811
    edges = erdos_renyi(spark, 40, 0.2, seed=7)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(40))
    before = {
        (r["u"], r["v"])
        for r in g.edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        ).distinct().collect()
    }
    g2 = edge_switching(g, switches_per_edge=2.5, seed=11)
    after = {
        (r["u"], r["v"])
        for r in g2.edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        ).distinct().collect()
    }
    # exact degree sequence, same edge count, still simple
    assert sorted(_degrees(g).values()) == sorted(_degrees(g2).values())
    assert len(after) == len(before)
    assert all(u != v for u, v in after)
    # the chain actually moved
    assert after != before
    changed = len(after - before)
    assert changed > len(before) * 0.15


# --------------------------------------------------------------- curveball
M = 1_000_000_007
CO = [2654435761, 40503, 97, 1000003]


def _mix_py(*xs):
    h1 = sum(int(x) * CO[i % 4] for i, x in enumerate(xs)) % M
    h2 = (h1 * h1 + CO[0] * h1 + CO[1]) % M
    return (h2 * h2 + CO[2] * h2 + CO[3]) % M


def _curveball_round_py(edges, nodes, rnd, seed, nb):
    """Pure-Python replay of operators/randomization._curveball_round
    (same hashes, same tie-breaks) — change together."""
    buckets = {}
    for n in nodes:
        k = _mix_py(n, rnd, seed)
        buckets.setdefault(k % nb, []).append((k, n))
    pairs = {}
    for b, lst in buckets.items():
        lst.sort()
        for i in range(0, len(lst) - 1, 2):
            pid = (i // 2) * nb + b
            pairs[pid] = (lst[i][1], lst[i + 1][1])
    return _trade_round_py(edges, pairs, rnd, seed)


def _trade_round_py(edges, pairs, rnd, seed):
    """Replay of operators/randomization._trade_round over explicit
    disjoint pairs {pid: (id0, id1)} — change together."""
    side_of = {}
    for pid, (id0, id1) in pairs.items():
        side_of[id0] = (pid, 0)
        side_of[id1] = (pid, 1)
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    fixed, common, pool = [], [], {}
    for u, v in edges:
        pu, pv = side_of.get(u), side_of.get(v)
        if pu is None and pv is None:
            fixed.append((u, v))
            continue
        if pu is not None and pv is not None and pu[0] == pv[0]:
            fixed.append((u, v))
            continue
        if pv is None:
            owner = 0
        elif pu is None:
            owner = 1
        else:
            su, sv = _mix_py(u, rnd, seed + 7), _mix_py(v, rnd, seed + 7)
            owner = 0 if su < sv else (1 if sv < su else 0)
        o, w = (u, v) if owner == 0 else (v, u)
        pid, side_o = side_of[o]
        partner = pairs[pid][1 - side_o]
        if w in adj.get(partner, ()):
            common.append((u, v))
        else:
            pool.setdefault(pid, []).append((side_o, w))
    assignments, created = {}, {}
    for pid, members in pool.items():
        q0 = sum(1 for s, _ in members if s == 0)
        ordered = sorted(
            members, key=lambda sw: (_mix_py(pid % M, sw[1], rnd, seed + 13), sw[1])
        )
        rows = []
        for i, (s, w) in enumerate(ordered):
            sn = 0 if i < q0 else 1
            rows.append((s, w, sn))
            if sn != s:
                t = pairs[pid][sn]
                created.setdefault((min(t, w), max(t, w)), []).append(pid)
        assignments[pid] = rows
    reverted = set()
    for e, pids in created.items():
        if len(pids) > 1:
            reverted.update(pids)
    out = list(fixed) + list(common)
    for pid, rows in assignments.items():
        for s, w, sn in rows:
            t = pairs[pid][s if pid in reverted else sn]
            out.append((min(t, w), max(t, w)))
    return out


def _global_curveball_py(edges, nodes, rounds, seed, nb):
    es = list(edges)
    for r in range(rounds):
        es = _curveball_round_py(es, nodes, r, seed, nb)
        assert len(set(es)) == len(es)  # simplicity after every round
    return set(es)


def _eset(gr):
    return {
        (r["u"], r["v"])
        for r in gr.edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        ).distinct().collect()
    }


def test_global_curveball_matches_python_replay(spark):  # noqa: F811
    from networkit_spark.operators.randomization import global_curveball

    edges = erdos_renyi(spark, 80, 0.08, seed=3)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(80))
    before = _eset(g)
    got = _eset(global_curveball(g, n_global_trades=3, seed=5, n_buckets=8))
    want = _global_curveball_py(before, range(80), 3, 5, 8)
    assert got == want


def test_global_curveball_invariants(spark):  # noqa: F811
    from networkit_spark.operators.randomization import global_curveball

    edges = erdos_renyi(spark, 60, 0.12, seed=9)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(60))
    before = _eset(g)
    g2 = global_curveball(g, n_global_trades=4, seed=2, n_buckets=8)
    after = _eset(g2)
    # the reference contract (GlobalCurveballGTest): exact per-node
    # degrees, simple graph; and the chain actually moves
    assert _degrees(g) == _degrees(g2)
    assert len(after) == len(before)
    assert all(u != v for u, v in after)
    assert after != before
    assert len(after - before) > len(before) * 0.2


def test_global_curveball_deterministic(spark):  # noqa: F811
    from networkit_spark.operators.randomization import global_curveball

    edges = erdos_renyi(spark, 40, 0.15, seed=4)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(40))
    a = _eset(global_curveball(g, n_global_trades=2, seed=3))
    b = _eset(global_curveball(g, n_global_trades=2, seed=3))
    c = _eset(global_curveball(g, n_global_trades=2, seed=4))
    assert a == b
    assert a != c


def _curveball_py(edges, trades, seed):
    """Replay of operators/randomization.curveball: greedy node-disjoint
    batching + _trade_round per batch — change together."""
    batches, used = [[]], set()
    for u, v in trades:
        if u == v:
            continue
        if u in used or v in used:
            batches.append([])
            used = set()
        used.update((u, v))
        batches[-1].append((u, v))
    es = list(edges)
    for rnd, batch in enumerate(b for b in batches if b):
        pairs = {
            i: (min(u, v), max(u, v)) for i, (u, v) in enumerate(batch)
        }
        es = _trade_round_py(es, pairs, rnd, seed)
        assert len(set(es)) == len(es)
    return set(es)


def test_curveball_matches_python_replay(spark):  # noqa: F811
    from networkit_spark.operators.randomization import (
        curveball,
        uniform_trades,
    )

    edges = erdos_renyi(spark, 50, 0.12, seed=6)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(50))
    before = _eset(g)
    trades = uniform_trades(50, 40, seed=11)
    got = _eset(curveball(g, trades, seed=5))
    want = _curveball_py(before, trades, 5)
    assert got == want


def test_curveball_invariants(spark):  # noqa: F811
    from networkit_spark.operators.randomization import (
        curveball,
        uniform_trades,
    )

    edges = erdos_renyi(spark, 40, 0.2, seed=2)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(40))
    before = _eset(g)
    g2 = curveball(g, uniform_trades(40, 30, seed=3), seed=1)
    after = _eset(g2)
    # CurveballGTest contract: degrees exact, simple, chain moves
    assert _degrees(g) == _degrees(g2)
    assert len(after) == len(before)
    assert all(u != v for u, v in after)
    assert after != before


def test_edge_switching_deterministic(spark):  # noqa: F811
    edges = erdos_renyi(spark, 30, 0.2, seed=1)
    g = Graph.from_edges(edges, directed=False, vertices=spark.range(30))

    def eset(gr):
        return {
            (r["u"], r["v"])
            for r in gr.edges.select(
                F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
            ).distinct().collect()
        }

    a = eset(edge_switching(g, switches_per_edge=2.0, seed=5))
    b = eset(edge_switching(g, switches_per_edge=2.0, seed=5))
    c = eset(edge_switching(g, switches_per_edge=2.0, seed=6))
    assert a == b
    assert a != c
