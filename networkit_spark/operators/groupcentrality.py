"""Group closeness / group harmonic closeness — greedy submodular
maximization over a distance table.

Reference:
- GroupCloseness.cpp:69-153 run(): S = {top closeness node}; each round
  adds the node with the largest farness improvement, where
  improvement(u) = Σ_v (d[v] − min(d[v], dist(u, v))) + d[u]
  (computeImprovement :24-48 — a pruned BFS that relaxes exactly to
  min(d[v], dist(u, v))); updateDistances :50-67 folds the winner in
  (d[v] ← min(d[v], dist(u*, v))). Nodes unreachable from the seed
  keep d = 0 and never contribute (:85-91 zero-init quirk) — the
  greedy stays inside the seed's component.
- GroupCloseness.hpp:103-113 scoreOfGroup: (n − |S|) / Σ_v dist(v, S)
  with the sum over nodes reachable from S.
- GroupHarmonicCloseness.cpp:622-629 scoreOfGroup:
  Σ_{v: dist(v,S) > 0} 1 / dist(v, S); run() greedily maximizes the
  same objective (marginal gain can be negative for the member's own
  lost term — kept, as in the reference's score difference).

Spark-native design: the reference evaluates candidates with pruned
BFS per candidate under OpenMP; here ALL candidates are evaluated at
once from the batched multi-source-BFS distance table (operators/apsp)
— each greedy round is ONE join + groupBy-agg over (candidate,
vertex) pairs, k rounds total. Tie-breaks are deterministic
(gain DESC, id ASC) — the reference's parallel bucket-PQ order is
schedule-dependent; the documented substitution, replayed exactly by
the SQL oracle.

Scale: the distance table is O(n·n_reachable) rows — the same
asymptotics the reference's exact greedy pays in time; for web-scale
graphs bound the horizon with max_depth (the reference's H parameter:
improvements past depth H are ignored, GroupCloseness.cpp:35 `h`)
and/or restrict `candidates`, which shrinks the table to
O(n · ball_H).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from networkit_spark.graph import Graph
from networkit_spark.operators.apsp import apsp


def _dist_table(graph: Graph, max_depth: int | None) -> DataFrame:
    d = apsp(graph)
    if max_depth:
        d = d.filter(F.col("dist") <= max_depth)
    return d.persist(StorageLevel.MEMORY_AND_DISK)


def group_closeness(
    graph: Graph, k: int, max_depth: int | None = None
) -> tuple[list[int], float]:
    """(members in pick order, score) — greedy group closeness
    (GroupCloseness.cpp run + hpp scoreOfGroup)."""
    dist = _dist_table(graph, max_depth)
    n = graph.num_vertices()
    # first pick = the exact top-closeness node: min total farness over
    # its reachable set is NOT the rule — the reference takes TopCloseness
    # #1, which on each component is min farness; across components the
    # standard closeness (n−1)/far · (r−1)/(n−1) scaling reduces to
    # maximizing (r−1)²/far (Closeness.cpp variant). For the greedy seed
    # we use min(Σ dist / (r−1)²) — identical on connected graphs,
    # component-aware otherwise; ties broken by id.
    far = dist.groupBy("s").agg(
        F.sum("dist").alias("far"), F.count("*").alias("r")
    )
    first = (
        far.filter(F.col("r") > 1)
        .orderBy(
            (F.col("far") / ((F.col("r") - 1) * (F.col("r") - 1))).asc(),
            F.col("s").asc(),
        )
        .first()
    )
    if first is None:  # edgeless graph
        dist.unpersist()
        return [], 0.0
    members = [int(first["s"])]
    d = dist.filter(F.col("s") == members[0]).select("id", F.col("dist").alias("d"))
    for _ in range(1, k):
        gains = (
            dist.join(d, "id")
            .filter(~F.col("s").isin(*members))
            .groupBy("s")
            .agg(F.sum(
                F.greatest(F.lit(0), F.col("d") - F.col("dist"))
            ).alias("gain"))
        )
        top = gains.orderBy(F.col("gain").desc(), F.col("s").asc()).first()
        if top is None:
            break
        u = int(top["s"])
        members.append(u)
        du = dist.filter(F.col("s") == u).select(
            "id", F.col("dist").alias("du")
        )
        d = (
            d.join(du, "id", "left")
            .select("id", F.least("d", F.coalesce("du", "d")).alias("d"))
        )
        d = d.persist()
        d.count()
    sum_d = d.agg(F.sum("d")).first()[0] or 0
    dist.unpersist()
    score = (float(n - len(members)) / sum_d) if sum_d > 0 else 0.0
    return members, score


def group_harmonic_closeness(
    graph: Graph, k: int, max_depth: int | None = None
) -> tuple[list[int], float]:
    """(members in pick order, score) — greedy group harmonic closeness
    (GroupHarmonicCloseness.cpp; score = Σ_{dist>0} 1/dist(v, S))."""
    dist = _dist_table(graph, max_depth)
    inv = F.when(F.col("dist") > 0, F.lit(1.0) / F.col("dist")).otherwise(
        F.lit(0.0)
    )
    first = (
        dist.groupBy("s").agg(F.sum(inv).alias("h"))
        .orderBy(F.col("h").desc(), F.col("s").asc())
        .first()
    )
    if first is None:
        dist.unpersist()
        return [], 0.0
    members = [int(first["s"])]
    d = dist.filter(F.col("s") == members[0]).select("id", F.col("dist").alias("d"))
    for _ in range(1, k):
        # marginal gain of u: Σ_v [inv(min(d, dist(u,v))) − inv(d)],
        # over v reachable from u; v unreached by S has d = ∞ (absent).
        joined = dist.filter(~F.col("s").isin(*members)).join(d, "id", "left")
        newd = F.least(F.coalesce("d", F.col("dist")), F.col("dist"))
        oldterm = F.when(
            F.col("d").isNotNull() & (F.col("d") > 0),
            F.lit(1.0) / F.col("d"),
        ).otherwise(F.lit(0.0))
        newterm = F.when(newd > 0, F.lit(1.0) / newd).otherwise(F.lit(0.0))
        gains = joined.groupBy("s").agg(F.sum(newterm - oldterm).alias("gain"))
        top = gains.orderBy(F.col("gain").desc(), F.col("s").asc()).first()
        if top is None:
            break
        u = int(top["s"])
        members.append(u)
        du = dist.filter(F.col("s") == u).select("id", F.col("dist").alias("du"))
        d = (
            d.join(du, "id", "full")
            .select(
                "id",
                F.least(
                    F.coalesce("d", "du"), F.coalesce("du", "d")
                ).alias("d"),
            )
        )
        d = d.persist()
        d.count()
    score = d.agg(
        F.sum(
            F.when(F.col("d") > 0, F.lit(1.0) / F.col("d")).otherwise(F.lit(0.0))
        )
    ).first()[0] or 0.0
    dist.unpersist()
    return members, float(score)


def score_of_group_closeness(graph: Graph, members: list[int]) -> float:
    """GroupCloseness.hpp:103-113 scoreOfGroup."""
    dist = apsp(graph)
    src = graph.edges.sparkSession.createDataFrame(
        [(int(m),) for m in members], "s long"
    )
    dmin = (
        dist.join(F.broadcast(src), "s", "left_semi")
        .groupBy("id").agg(F.min("dist").alias("d"))
    )
    sum_d = dmin.agg(F.sum("d")).first()[0] or 0
    n = graph.num_vertices()
    return (float(n - len(members)) / sum_d) if sum_d > 0 else 0.0


def score_of_group_harmonic(graph: Graph, members: list[int]) -> float:
    """GroupHarmonicCloseness.cpp:622-629 scoreOfGroup."""
    dist = apsp(graph)
    src = graph.edges.sparkSession.createDataFrame(
        [(int(m),) for m in members], "s long"
    )
    dmin = (
        dist.join(F.broadcast(src), "s", "left_semi")
        .groupBy("id").agg(F.min("dist").alias("d"))
    )
    return float(
        dmin.agg(
            F.sum(
                F.when(F.col("d") > 0, F.lit(1.0) / F.col("d"))
                .otherwise(F.lit(0.0))
            )
        ).first()[0]
        or 0.0
    )
