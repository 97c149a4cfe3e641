"""Floyd–Warshall all-pairs weighted distances with negative-cycle
tagging — as min-plus matrix doubling over the lexicographic
(distance, hops) semiring.

Reference (networkit/cpp/distance/FloydWarshall.cpp):
- ctor throws on unweighted graphs (:12-16);
- run():38-86 — triple relaxation keeping, per pair, the minimum
  distance and (among equal distances) the minimum hop count;
- tagNegativeCycles():18-36 — for every w with distances[w][w] < 0,
  every u that reaches w is marked in-negative-cycle, every pair
  (u, v) with u→w and w→v finite is set to -infinity;
- getDistance / isNodeInNegativeCycle (:88-97).

Spark-first substitution: the reference's k-loop over intermediates is
inherently sequential (n supersteps). Over any idempotent semiring the
same fixed point is reached by MATRIX DOUBLING — D ← min_lex(D, D ⊗ D)
— in ceil(log2 n) supersteps, each one self-join + lexicographic
min-aggregation on the (u, v, dist, hops) pair table. Lexicographic
(dist, hops) min-plus is associative and distributes over elementwise
+, so both computations equal the true min over paths: identical
distances AND identical hop tie-breaks for every pair not touching a
negative cycle.

Negative cycles: after doubling to walk length ≥ n, a node c on any
simple negative cycle has d(c, c) < 0 (the cycle is a walk of ≤ n
edges). The tagging closure is then the reference's own: any w the
reference tags lies on a path to/from such a c, and d(u, w) finite ⇒
d(u, c) finite, so the tagged NODE set and the -inf PAIR set coincide
with FloydWarshall.cpp's even where the two algorithms' intermediate
diagonals differ (proof sketch: every negative closed walk contains a
simple negative cycle, and FW computes exact values on simple cycles).

Scale: the output is inherently O(n²) — this is a dense-matrix
operator; at web scale use spsp/apsp with a sampled source set instead.
The doubling join shuffles the pair table on the shared middle vertex
(hash partition), log2 n times; AQE handles the skewed high-degree
middles. getNodesOnShortestPath's pathMatrix is not materialized (an
O(n²) successor table of driver-replayed pointers); hop counts — the
part of the path structure the tie-break observes — are returned.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.iterative import truncate


def floyd_warshall(graph: Graph) -> tuple[DataFrame, DataFrame]:
    """(distances, negative_cycle_nodes):
    distances = (u, v, dist DOUBLE, hops BIGINT) for reachable pairs —
    dist is -Infinity (hops NULL) for pairs the reference sets to
    -infinity; unreachable pairs are absent (reference: +infinity).
    negative_cycle_nodes = (id) — isNodeInNegativeCycle."""
    if not graph.weighted:
        raise ValueError("The input graph is unweighted!")
    # undirected Graph.edges already stores both orientations
    arcs = graph.edges.select("src", "dst", "weight")
    verts = graph.vertices()
    n = graph.num_vertices()
    base = (
        arcs.filter(F.col("src") != F.col("dst"))
        .groupBy(F.col("src").alias("u"), F.col("dst").alias("v"))
        .agg(F.min("weight").alias("dist"))
        .withColumn("hops", F.lit(1).cast("long"))
        .unionByName(
            verts.select(
                F.col("id").alias("u"), F.col("id").alias("v"),
                F.lit(0.0).alias("dist"), F.lit(0).cast("long").alias("hops"),
            )
        )
    )

    def _lex_min(df: DataFrame) -> DataFrame:
        # min dist, then min hops among rows attaining it — one agg via
        # a struct min (lexicographic by construction)
        return (
            df.groupBy("u", "v")
            .agg(F.min(F.struct("dist", "hops")).alias("s"))
            .select("u", "v", F.col("s.dist").alias("dist"),
                    F.col("s.hops").alias("hops"))
        )

    state = truncate(_lex_min(base))
    rounds = max(1, math.ceil(math.log2(max(2, n))) + 1)  # walks ≥ n edges
    for _ in range(rounds):
        left = state.select(F.col("u"), F.col("v").alias("m"),
                            F.col("dist").alias("d1"), F.col("hops").alias("h1"))
        right = state.select(F.col("u").alias("m"), F.col("v"),
                             F.col("dist").alias("d2"), F.col("hops").alias("h2"))
        cand = left.join(right, "m").select(
            "u", "v", (F.col("d1") + F.col("d2")).alias("dist"),
            (F.col("h1") + F.col("h2")).alias("hops"),
        )
        state = truncate(_lex_min(state.unionByName(cand)), release=state)

    neg_diag = state.filter((F.col("u") == F.col("v")) & (F.col("dist") < 0)) \
        .select(F.col("u").alias("w"))
    # nodes that REACH a negative diagonal (u with d(u, w) finite) or are
    # REACHED from one (d(w, v) finite) are in a negative cycle
    to_w = state.join(neg_diag, state.v == neg_diag.w, "left_semi") \
        .select(F.col("u").alias("id"))
    from_w = state.join(neg_diag, state.u == neg_diag.w, "left_semi") \
        .select(F.col("v").alias("id"))
    neg_nodes = truncate(to_w.unionByName(from_w).distinct())

    # pairs u→w, w→v through any tagged diagonal w become -infinity
    bad_pairs = (
        state.join(neg_diag, state.v == neg_diag.w)
        .select("u", "w")
        .join(
            state.select(F.col("u").alias("w2"), F.col("v")),
            F.col("w") == F.col("w2"),
        )
        .select("u", "v")
        .distinct()
        .withColumn("bad", F.lit(True))
    )
    dists = (
        state.join(bad_pairs, ["u", "v"], "left")
        .select(
            "u", "v",
            F.when(F.col("bad").isNotNull(),
                   F.lit(float("-inf"))).otherwise(F.col("dist")).alias("dist"),
            F.when(F.col("bad").isNotNull(),
                   F.lit(None).cast("long")).otherwise(F.col("hops")).alias("hops"),
        )
    )
    return dists, neg_nodes
