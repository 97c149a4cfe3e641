"""Strongly connected components vs a Tarjan oracle."""

import pytest

from networkit_spark.graph import Graph
from networkit_spark.operators.scc import strongly_connected_components


def tarjan_oracle(n, edges):
    """Iterative Tarjan → {node: min id in its SCC}."""
    adj = {i: [] for i in range(n)}
    for u, v in edges:
        adj[u].append(v)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    result = {}
    counter = [0]

    def strongconnect(v0):
        work = [(v0, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    result[w] = m
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])

    for v in range(n):
        if v not in index:
            strongconnect(v)
    return result


CASES = [
    # two 3-cycles joined by a one-way bridge + a tail
    (8, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (5, 6), (6, 7)]),
    # pure DAG → all singletons
    (5, [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]),
    # one big cycle
    (6, [(i, (i + 1) % 6) for i in range(6)]),
    # self-loops and parallel structure
    (4, [(0, 0), (0, 1), (1, 2), (2, 1), (2, 3)]),
]


@pytest.mark.parametrize("n,edges", CASES)
def test_scc_vs_tarjan(spark, n, edges):
    g = Graph.from_pairs(spark, edges, directed=True, n=n)
    res = strongly_connected_components(g)
    got = {r["id"]: r["label"] for r in res.labels.collect()}
    assert got == tarjan_oracle(n, edges)


def test_scc_requires_directed(spark):
    g = Graph.from_pairs(spark, [(0, 1)], directed=False, n=2)
    with pytest.raises(ValueError):
        strongly_connected_components(g)


def test_scc_random_vs_tarjan(spark):
    import random

    rng = random.Random(7)
    n = 30
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(60)]
    edges = [(u, v) for u, v in edges if u != v]
    g = Graph.from_pairs(spark, edges, directed=True, n=n)
    res = strongly_connected_components(g)
    got = {r["id"]: r["label"] for r in res.labels.collect()}
    assert got == tarjan_oracle(n, edges)


def test_scc_long_descending_path_logarithmic_rounds(spark):
    # descending-id path DAG: with id-priority coloring this is ONE color
    # class and peels one SCC per round (O(n)); hash priorities split it
    # into random prefix-maxima classes -> O(log n) expected rounds.
    n = 128
    edges = [(i + 1, i) for i in range(n - 1)]  # n-1 -> ... -> 0
    g = Graph.from_pairs(spark, edges, directed=True, n=n)
    res = strongly_connected_components(g)
    assert res.number_of_components() == n  # all singletons
    assert res.rounds <= 24  # far below the n/2 ~ 64 degenerate bound
