"""Planarity testing — the left-right (Brandes) criterion.

Reference: networkit/cpp/planarity/LeftRightPlanarityCheck.cpp:14-278 —
Euler-criterion fast reject (m > 3n − 6), DFS orientation computing
(height, lowpt, lowpt2, nesting depth), adjacency sorted by nesting
depth, then the testing DFS maintaining a stack of conflict pairs of
return-edge intervals; the graph is planar iff no constraint ever
forces a same-side conflict. The algorithm is U. Brandes' published
left-right planarity test (check-only phase — the reference likewise
only reports the boolean).

Spark decomposition — the DFS phases are inherently sequential (like
traversal.DFSfrom), but planarity is decidable PER BICONNECTED
COMPONENT (a graph is planar iff all its blocks are), and the engine
already computes blocks distributed (operators/biconnected.py). The
pipeline is therefore:

1. distributed Euler reject on the whole graph: one count, no DFS;
2. distributed Tarjan–Vishkin block decomposition;
3. per-block Euler reject (m_b > 3·n_b − 6) + trivially-planar pass
   (n_b ≤ 4) — both plain aggregations;
4. the surviving blocks run the iterative left-right check inside an
   `applyInPandas` group (one python check per block, executor-side,
   all blocks in parallel). A web-scale graph's giant biconnected core
   can exceed one executor's memory — the same stated bound as Leiden's
   per-parent refinement; for link graphs the Euler reject fires long
   before that (any block denser than 3n−6 never reaches python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph

_INF = float("inf")


class _Interval:
    __slots__ = ("low", "high")

    def __init__(self, low=None, high=None):
        self.low = low
        self.high = high

    def empty(self):
        return self.low is None and self.high is None


class _ConflictPair:
    __slots__ = ("L", "R")

    def __init__(self, L=None, R=None):
        self.L = L if L is not None else _Interval()
        self.R = R if R is not None else _Interval()

    def swap(self):
        self.L, self.R = self.R, self.L


def lr_planarity_check(adj: dict) -> bool:
    """Boolean left-right planarity test over an adjacency dict
    {node: iterable of neighbors} of a SIMPLE undirected graph.
    Iterative DFS in both phases (no recursion-depth limit)."""
    n = len(adj)
    if n <= 4:
        return True
    m = sum(len(vs) for vs in adj.values()) // 2
    if m > 3 * n - 6:
        return False

    height = {v: _INF for v in adj}
    lowpt: dict = {}
    lowpt2: dict = {}
    nesting_depth: dict = {}
    parent_edge = {v: None for v in adj}
    oriented = {v: [] for v in adj}
    visited = set()
    roots = []

    def _finish(vw, v, e):
        # nesting depth + parent lowpoint propagation (run when the edge's
        # lowpoints are final: immediately for back edges, at child pop
        # for tree edges)
        nesting_depth[vw] = 2 * lowpt[vw] + (1 if lowpt2[vw] < height[v] else 0)
        if e is not None:
            if lowpt[vw] < lowpt[e]:
                lowpt2[e] = min(lowpt[e], lowpt2[vw])
                lowpt[e] = lowpt[vw]
            elif lowpt[vw] > lowpt[e]:
                lowpt2[e] = min(lowpt2[e], lowpt[vw])
            else:
                lowpt2[e] = min(lowpt2[e], lowpt2[vw])

    # ---- phase 1: orientation ----
    for s in adj:
        if height[s] != _INF:
            continue
        height[s] = 0
        roots.append(s)
        stack = [(s, iter(adj[s]))]
        while stack:
            v, it = stack[-1]
            e = parent_edge[v]
            descended = False
            for w in it:
                if frozenset((v, w)) in visited:
                    continue
                visited.add(frozenset((v, w)))
                vw = (v, w)
                lowpt[vw] = height[v]
                lowpt2[vw] = height[v]
                oriented[v].append(w)
                if height[w] == _INF:  # tree edge
                    parent_edge[w] = vw
                    height[w] = height[v] + 1
                    stack.append((w, iter(adj[w])))
                    descended = True
                    break
                lowpt[vw] = height[w]  # back edge
                _finish(vw, v, e)
            if not descended:
                stack.pop()
                if e is not None:
                    _finish(e, e[0], parent_edge[e[0]])

    ordered = {
        v: sorted(ws, key=lambda w: nesting_depth[(v, w)])
        for v, ws in oriented.items()
    }

    # ---- phase 2: testing ----
    S: list = []
    stack_bottom: dict = {}
    lowpt_edge: dict = {}
    ref: dict = {}

    def conflicting(I, b):
        return not I.empty() and lowpt[I.high] > lowpt[b]

    def lowest(P):
        vals = []
        if not P.L.empty():
            vals.append(lowpt[P.L.low])
        if not P.R.empty():
            vals.append(lowpt[P.R.low])
        return min(vals)

    def add_constraints(ei, e):
        P = _ConflictPair()
        # merge the return edges of ei into P.R
        while True:
            Q = S.pop()
            if not Q.L.empty():
                Q.swap()
            if not Q.L.empty():
                return False
            if Q.R.low is not None and lowpt[Q.R.low] > lowpt[e]:
                if P.R.empty():
                    P.R.high = Q.R.high
                else:
                    ref[P.R.low] = Q.R.high
                P.R.low = Q.R.low
            else:  # align
                ref[Q.R.low] = lowpt_edge[e]
            if (S[-1] if S else None) is stack_bottom[ei]:
                break
        # merge the conflicting return edges of earlier siblings into P.L
        while S and (conflicting(S[-1].L, ei) or conflicting(S[-1].R, ei)):
            Q = S.pop()
            if conflicting(Q.R, ei):
                Q.swap()
            if conflicting(Q.R, ei):
                return False
            ref[P.R.low] = Q.R.high
            if Q.R.low is not None:
                P.R.low = Q.R.low
            if P.L.empty():
                P.L.high = Q.L.high
            else:
                ref[P.L.low] = Q.L.high
            P.L.low = Q.L.low
        if not (P.L.empty() and P.R.empty()):
            S.append(P)
        return True

    def trim_back_edges(u):
        while S and lowest(S[-1]) == height[u]:
            P = S.pop()
            # side bookkeeping dropped: the check-only phase never reads it
        if S:
            P = S.pop()
            while P.L.high is not None and P.L.high[1] == u:
                P.L.high = ref.get(P.L.high)
            if P.L.high is None and P.L.low is not None:
                ref[P.L.low] = P.R.low
                P.L.low = None
            while P.R.high is not None and P.R.high[1] == u:
                P.R.high = ref.get(P.R.high)
            if P.R.high is None and P.R.low is not None:
                ref[P.R.low] = P.L.low
                P.R.low = None
            S.append(P)

    for s in roots:
        frames = [[s, 0, None]]
        while frames:
            fr = frames[-1]
            v = fr[0]
            e = parent_edge[v]
            adjv = ordered[v]
            if fr[2] is not None:  # post-block of the tree edge just popped
                ei = fr[2]
                fr[2] = None
                if lowpt[ei] < height[v]:  # ei has a return edge
                    if fr[1] - 1 == 0:
                        lowpt_edge[e] = lowpt_edge[ei]
                    else:
                        if not add_constraints(ei, e):
                            return False
            if fr[1] < len(adjv):
                w = adjv[fr[1]]
                fr[1] += 1
                ei = (v, w)
                stack_bottom[ei] = S[-1] if S else None
                if ei == parent_edge.get(w):  # tree edge: descend
                    fr[2] = ei
                    frames.append([w, 0, None])
                    continue
                # back edge
                lowpt_edge[ei] = ei
                S.append(_ConflictPair(R=_Interval(ei, ei)))
                if lowpt[ei] < height[v]:
                    if fr[1] - 1 == 0:
                        lowpt_edge[e] = lowpt_edge[ei]
                    else:
                        if not add_constraints(ei, e):
                            return False
                continue
            # leaving v
            frames.pop()
            if e is not None:
                u = e[0]
                trim_back_edges(u)
                if lowpt[e] < height[u]:  # e has a return edge
                    if S:
                        hl, hr = S[-1].L.high, S[-1].R.high
                        if hl is not None and (hr is None or lowpt[hl] > lowpt[hr]):
                            ref[e] = hl
                        else:
                            ref[e] = hr
    return True


def block_planarity(graph: Graph) -> DataFrame:
    """(block, n_nodes, n_edges, is_planar) — planarity of every
    biconnected block (the whole graph is planar iff all rows are).
    Euler-reject and trivial blocks never leave the JVM; the rest run
    the left-right check per block in parallel Arrow groups."""
    import pandas as pd

    from networkit_spark.operators.biconnected import biconnected_components

    bic = biconnected_components(graph)
    eb = bic.edge_blocks  # (u, v, block)
    stats = eb.groupBy("block").agg(
        F.count("*").alias("n_edges"),
        F.size(F.array_distinct(F.flatten(F.collect_list(F.array("u", "v")))))
        .cast("long")
        .alias("n_nodes"),
    )
    decided = stats.select(
        "block", "n_nodes", "n_edges",
        F.when(F.col("n_nodes") <= 4, F.lit(True))
        .when(F.col("n_edges") > 3 * F.col("n_nodes") - 6, F.lit(False))
        .otherwise(F.lit(None))
        .alias("is_planar"),
    )
    todo = eb.join(
        decided.filter(F.col("is_planar").isNull()).select("block"), "block"
    )

    def _check(pdf: pd.DataFrame) -> pd.DataFrame:
        adj: dict = {}
        for u, v in zip(pdf["u"], pdf["v"]):
            adj.setdefault(int(u), []).append(int(v))
            adj.setdefault(int(v), []).append(int(u))
        return pd.DataFrame(
            {"block": [int(pdf["block"].iloc[0])],
             "is_planar": [lr_planarity_check(adj)]}
        )

    checked = todo.groupBy("block").applyInPandas(
        _check, "block long, is_planar boolean"
    )
    return (
        decided.join(checked.withColumnRenamed("is_planar", "lr"), "block", "left")
        .select(
            "block", "n_nodes", "n_edges",
            F.coalesce("is_planar", "lr").alias("is_planar"),
        )
    )


def is_planar(graph: Graph) -> bool:
    """LeftRightPlanarityCheck.run() boolean: whole-graph Euler reject,
    then every biconnected block must pass."""
    n = graph.num_vertices()
    und = graph.simple_undirected_edges()
    m = und.count()
    if n > 2 and m > 3 * n - 6:
        return False
    if m == 0:
        return True
    return (
        block_planarity(graph)
        .filter(~F.col("is_planar"))
        .limit(1)
        .count()
        == 0
    )
