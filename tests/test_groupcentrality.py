"""Group closeness / harmonic — pure-Python greedy replica (identical
pick rule: gain DESC, id ASC), scoreOfGroup contracts, star/barbell
sanity, and the max_depth horizon."""

import math
from collections import deque

from networkit_spark.graph import Graph
from networkit_spark.operators import groupcentrality as gc
from tests.conftest import spark  # noqa: F401
from tests.test_commutetime import _connected_er


def _bfs(adj, srcs):
    d = {s: 0 for s in srcs}
    q = deque(srcs)
    while q:
        u = q.popleft()
        for w in adj.get(u, ()):
            if w not in d:
                d[w] = d[u] + 1
                q.append(w)
    return d


def _adj(und):
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj


def _py_group_closeness(n, und, k):
    adj = _adj(und)
    nodes = sorted(set(range(n)) | set(adj))
    best, bkey = None, None
    for s in nodes:
        d = _bfs(adj, [s])
        if len(d) <= 1:
            continue
        far, r = sum(d.values()), len(d)
        key = (far / ((r - 1) ** 2), s)
        if bkey is None or key < bkey:
            bkey, best = key, s
    S = [best]
    d = _bfs(adj, [best])  # reachable-only, reference zero-init quirk
    for _ in range(1, k):
        gains = {}
        for u in nodes:
            if u in S:
                continue
            du = _bfs(adj, [u])
            gains[u] = sum(
                max(0, dv - du[v]) for v, dv in d.items() if v in du
            )
        u = min(gains, key=lambda x: (-gains[x], x))
        S.append(u)
        du = _bfs(adj, [u])
        d = {v: min(dv, du.get(v, dv)) for v, dv in d.items()}
    sum_d = sum(d.values())
    return S, (n - len(S)) / sum_d if sum_d else 0.0


def _py_group_harmonic(n, und, k):
    adj = _adj(und)
    nodes = sorted(set(range(n)) | set(adj))

    def hscore(d):
        return sum(1.0 / x for x in d.values() if x > 0)

    best = max(nodes, key=lambda s: (hscore(_bfs(adj, [s])), -s))
    S = [best]
    d = _bfs(adj, [best])
    for _ in range(1, k):
        gains = {}
        for u in nodes:
            if u in S:
                continue
            du = _bfs(adj, [u])
            nd = dict(d)
            for v, x in du.items():
                nd[v] = min(nd.get(v, x), x)
            gains[u] = hscore(nd) - hscore(d)
        u = min(gains, key=lambda x: (-gains[x], x))
        S.append(u)
        du = _bfs(adj, [u])
        for v, x in du.items():
            d[v] = min(d.get(v, x), x)
    return S, hscore(d)


def test_group_closeness_matches_replica(spark):  # noqa: F811
    g, und = _connected_er(spark, 16, 0.25, seed=4)
    want_S, want_score = _py_group_closeness(16, und, 4)
    got_S, got_score = gc.group_closeness(g, 4)
    assert got_S == want_S
    assert abs(got_score - want_score) < 1e-12


def test_group_harmonic_matches_replica(spark):  # noqa: F811
    g, und = _connected_er(spark, 14, 0.25, seed=8)
    want_S, want_score = _py_group_harmonic(14, und, 4)
    got_S, got_score = gc.group_harmonic_closeness(g, 4)
    assert got_S == want_S
    assert abs(got_score - want_score) < 1e-12


def test_group_closeness_double_star(spark):  # noqa: F811
    # two stars joined by a bridge: greedy k=2 must take both hubs
    edges = [(0, i) for i in range(2, 7)] + [(1, i) for i in range(7, 12)]
    edges.append((0, 1))
    g = Graph.from_pairs(spark, edges, directed=False)
    S, score = gc.group_closeness(g, 2)
    assert sorted(S) == [0, 1]
    # every other node at distance 1 from the group
    assert abs(score - (12 - 2) / 10.0) < 1e-12


def test_score_of_group_contracts(spark):  # noqa: F811
    g, und = _connected_er(spark, 12, 0.3, seed=1)
    S, score = gc.group_closeness(g, 3)
    assert abs(gc.score_of_group_closeness(g, S) - score) < 1e-12
    S2, score2 = gc.group_harmonic_closeness(g, 3)
    assert abs(gc.score_of_group_harmonic(g, S2) - score2) < 1e-12


def test_group_closeness_max_depth(spark):  # noqa: F811
    # path graph: with horizon 1 only direct neighbors count
    g = Graph.from_pairs(spark, [(i, i + 1) for i in range(5)],
                         directed=False)
    S, _ = gc.group_closeness(g, 2, max_depth=1)
    assert len(S) == 2 and S[0] != S[1]
