"""K-path centrality: self-avoiding random-walk visit counting.

Reference semantics (networkit/cpp/centrality/KPathCentrality.cpp:34-100):
t = 2k²·n^(1-2α)·log n walks; each walk starts at a random node, draws a
length l uniform in [1, k], and repeatedly steps to a not-yet-visited
neighbor (probability ∝ 1/w on weighted graphs, uniform on unweighted),
counting every visited node; score(v) = k·n·counter(v)/t.

Distributed reformulation: walks are ROWS — (wid, cur, visited array,
l) — and every random decision is the engine's shared quadratic hash
(operators/embedding.py walk-hash, identical arithmetic in DuckDB), so
the whole Monte-Carlo run is deterministic and the driver oracle can
replay it EXACTLY:

  - start nodes are stratified round-robin over the ranked vertex ids
    (wid-th walk starts at vertex rank wid mod n) — a deterministic
    substitute for the reference's uniform random starts with the same
    per-node expectation and strictly lower variance;
  - step j picks the candidate minimizing -ln(u)·w over the unvisited
    neighbors (exponential race ⇒ P ∝ 1/w, KPathCentrality.cpp:58-84);
    on unweighted graphs this reduces to the min of the integer-backed
    hash draw itself — no float in the comparison, bit-exact in SQL.

Per step: one shuffle join (walk frontier ⋈ adjacency) + one arg-min
aggregation; k steps total. Walk state is O(t·k); t and k are the
operator's work knobs exactly as in the reference.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from networkit_spark.graph import Graph
from networkit_spark.operators.embedding import _u
from networkit_spark.plans.iterative import Checkpointer, truncate
from networkit_spark.plans.ranking import global_row_numbers


def kpath_centrality(
    graph: Graph,
    alpha: float = 0.2,
    k: int = 0,
    t: int | None = None,
    seed: int = 1,
) -> DataFrame:
    """(id, score) for every vertex; score = k·n·visits/t, ROUND 9."""
    if not (-0.5 <= alpha <= 0.5):
        raise ValueError("alpha must lie in interval [-0.5, 0.5]")
    spark = graph.edges.sparkSession
    n = graph.num_vertices()
    m = graph.num_edges()
    if k <= 0:
        k = max(int(math.log(n + m)), 1)
    if t is None:
        t = int(2.0 * k * k * n ** (1 - 2 * alpha) * math.log(n))
    ckpt = Checkpointer(spark, None, algorithm="kpath")

    sym = (graph.edges if graph.directed else graph.symmetrized_edges()) \
        .filter(F.col("src") != F.col("dst")).select("src", "dst", "weight") \
        .persist(StorageLevel.MEMORY_AND_DISK)
    unweighted = (
        graph.edges.select("weight").distinct().limit(2).count() == 1
        and graph.edges.select("weight").first()
        and float(graph.edges.select("weight").first()[0]) == 1.0
    )

    # stratified starts: vertex ranked (wid mod n) — both engines rank by id
    ranked = global_row_numbers(graph.vertices(), "id", "rk")  # rk is 0-based
    walks = (
        spark.range(t).select(F.col("id").alias("wid"))
        .withColumn("rk", F.col("wid") % n)
        .join(ranked.select(F.col("id").alias("cur"), "rk"), "rk")
        .select(
            "wid", "cur",
            F.array(F.col("cur")).alias("vis"),
            (1 + F.floor(_u(F.col("wid"), 0, F.lit(0), seed) * k))
            .cast("long").alias("l"),
        )
    )
    state = truncate(walks)
    counts = None
    for j in range(1, k + 1):
        active = state.filter(F.col("l") >= j)
        cand = (
            active.join(sym, active.cur == sym.src)
            .filter(~F.array_contains(F.col("vis"), F.col("dst")))
        )
        draw = _u(F.col("wid"), j, F.col("dst"), seed)
        race = draw if unweighted else -F.log(draw) * F.col("weight")
        picks = (
            cand.groupBy("wid")
            .agg(F.min(F.struct(race.alias("r"), F.col("dst").alias("nxt"))).alias("b"))
            .select("wid", F.col("b.nxt").alias("nxt"))
        )
        state = truncate(
            state.join(picks, "wid", "left")
            .select(
                "wid",
                F.coalesce("nxt", F.col("cur")).alias("cur"),
                F.when(F.col("nxt").isNotNull(),
                       F.array_append("vis", F.col("nxt"))).otherwise(F.col("vis"))
                .alias("vis"),
                # a walk with no unvisited neighbor stops for good
                F.when(F.col("nxt").isNull(), F.lit(0)).otherwise(F.col("l"))
                .alias("l"),
            ),
            release=state,
        )
    visits = (
        state.select(F.explode(F.slice("vis", 2, k)).alias("id"))
        .groupBy("id").agg(F.count("*").alias("c"))
    )
    out = (
        graph.vertices().join(visits, "id", "left")
        .select(
            "id",
            F.round(F.lit(float(k) * n / t) * F.coalesce("c", F.lit(0)), 9)
            .alias("score"),
        )
    )
    sym.unpersist()
    ckpt.close()
    return out
