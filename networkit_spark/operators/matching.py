"""Local-max weighted matching.

Reference: cpp/matching/LocalMaxMatcher.cpp:20-72 — repeat until no
edges remain: every edge that is strictly heavier than both endpoints'
current candidates becomes the candidate of both; edges whose endpoints
mutually agree are matched; edges touching matched nodes drop out. The
reference breaks weight ties with random noise (:27); this engine uses
a deterministic total order (weight desc, then canonical endpoint pair
asc), so with UNIQUE weights the result equals the sequential greedy
matching exactly, and with ties it is one deterministic member of the
same 1/2-approximation family.

Spark shape per round: the candidate step is a window argmax over each
endpoint view of the live edge table (two rows per edge); the mutual
check is a self-join of the two chosen sides; removal is a semi-join
against the matched-vertex set. Locally-dominant edges always include
the globally heaviest live edge, so every round matches at least one
edge — O(log) rounds in practice, hard-bounded by max_rounds."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.storagelevel import StorageLevel

from networkit_spark.graph import Graph
from networkit_spark.plans.iterative import truncate


def local_max_matching(graph: Graph, max_rounds: int = 64) -> DataFrame:
    """Matching edges (u, v, weight) with u < v; no vertex appears twice."""
    spark = graph.edges.sparkSession
    live = (
        graph.simple_undirected_edges()
        .join(
            graph.symmetrized_edges().select(
                F.least("src", "dst").alias("u"),
                F.greatest("src", "dst").alias("v"),
                "weight",
            ),
            ["u", "v"],
        )
        .groupBy("u", "v")
        .agg(F.max("weight").alias("weight"))
    )
    live = truncate(live)
    matched_pieces: list[DataFrame] = []

    for _ in range(max_rounds):
        if live.limit(1).count() == 0:
            break
        sides = live.select(F.col("u").alias("node"), "u", "v", "weight").unionByName(
            live.select(F.col("v").alias("node"), "u", "v", "weight")
        )
        w = Window.partitionBy("node").orderBy(
            F.desc("weight"), F.asc("u"), F.asc("v")
        )
        chosen = (
            sides.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("node", "u", "v", "weight")
        )
        # mutual agreement: the same edge chosen from both endpoints
        mutual = (
            chosen.groupBy("u", "v", "weight")
            .agg(F.count("*").alias("sides"))
            .filter("sides = 2")
            .select("u", "v", "weight")
        )
        mutual = truncate(mutual)
        if mutual.limit(1).count() == 0:
            break
        matched_pieces.append(mutual)

        matched_nodes = mutual.select(F.col("u").alias("id")).unionByName(
            mutual.select(F.col("v").alias("id"))
        )
        live = truncate(
            live.join(matched_nodes.withColumnRenamed("id", "u"), "u", "left_anti")
            .join(matched_nodes.withColumnRenamed("id", "v"), "v", "left_anti")
            .select("u", "v", "weight"),
            release=live,
        )

    if not matched_pieces:
        return spark.createDataFrame([], "u long, v long, weight double")
    out = matched_pieces[0]
    for p in matched_pieces[1:]:
        out = out.unionByName(p)
    return out


def suitor_matching(graph: Graph, max_rounds: int = 256) -> DataFrame:
    """Matching edges (u, v, weight), u < v — SuitorMatcher.cpp:55-146.

    DOCUMENTED SUBSTITUTION: the reference seeds each proposal scan with
    a self-floor (heaviest = ws[current], partner = suitor[current],
    :59-60) whose `v < partner` tie-break blocks re-proposing to your own
    suitor; that makes its output depend on the forNodes processing
    order. Proof instance: weights {0-1: 1, 0-2: 2} — processing 0,1,2
    yields matching {(0,1)} (weight 1), processing 2 first yields
    {(0,2)} (weight 2); both pass the reference's own proper+maximal
    assertions. A faithful distributed replay would be a sequential
    chain replay (DFS-class). This engine therefore implements the
    CLASSIC suitor algorithm (Manne & Halappanavar, no self-floor) with
    deterministic tie-breaks (heavier weight, then smaller other
    endpoint, then smaller proposer): its fixed point is unique, order-
    independent, and equals the greedy matching over the total edge
    order (weight desc, canonical pair asc) — the same matching the
    engine's local_max_matching converges to, and a member of the same
    1/2-approximation family the reference certifies.

    Spark shape per round: active nodes pick their best admissible
    target (one gather join + struct-argmax), targets accept their best
    incoming proposal (one struct-argmax), displaced suitors and
    rejected proposers re-enter the active set. ws starts at 0 and
    suitor at none like the reference (:126-127), so zero-weight edges
    are proposable and negative-weight edges never are. Rounds are
    bounded by the longest displacement chain (O(log) on random weights;
    hard cap max_rounds).
    """
    if graph.directed:
        raise ValueError("SuitorMatcher does not support directed graphs")
    if graph.number_of_self_loops():
        raise ValueError("SuitorMatcher does not support self-loops")
    NONE = (1 << 62)  # stands for the reference's `none` in comparisons
    sym = graph.symmetrized_edges().select("src", "dst", "weight").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sym.count()
    spark = sym.sparkSession
    # state: best proposal each node HOLDS (ws, suitor); reference init
    state = truncate(
        graph.vertices().select(
            "id", F.lit(0.0).alias("ws"), F.lit(NONE).alias("suitor")
        )
    )
    active = truncate(graph.vertices().select("id"))
    for _ in range(max_rounds):
        if active.limit(1).count() == 0:
            break
        sv = state.select(
            F.col("id").alias("dst"),
            F.col("ws").alias("ws_v"),
            F.col("suitor").alias("s_v"),
        )
        cand = (
            sym.join(active.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(sv, "dst")
            .filter(
                (F.col("weight") > F.col("ws_v"))
                | ((F.col("weight") == F.col("ws_v")) & (F.col("src") < F.col("s_v")))
            )
        )
        # each active node proposes to its best admissible target
        proposals = (
            cand.groupBy("src")
            .agg(F.max(F.struct(F.col("weight"), (-F.col("dst")).alias("nd"), F.col("dst")))
                 .alias("pick"))
            .select(
                F.col("src").alias("prop"),
                F.col("pick.dst").alias("tgt"),
                F.col("pick.weight").alias("w"),
            )
        )
        proposals = truncate(proposals)
        if proposals.limit(1).count() == 0:
            break
        # targets accept their best incoming proposal
        accepted = (
            proposals.groupBy("tgt")
            .agg(F.max(F.struct(F.col("w"), (-F.col("prop")).alias("np"), F.col("prop")))
                 .alias("win"))
            .select(
                F.col("tgt").alias("id"),
                F.col("win.w").alias("new_ws"),
                F.col("win.prop").alias("new_suitor"),
            )
        )
        new_state = truncate(
            state.join(accepted, "id", "left").select(
                "id",
                F.coalesce("new_ws", "ws").alias("ws"),
                F.coalesce("new_suitor", "suitor").alias("suitor"),
            ),
            release=state,
        )
        # displaced previous suitors + proposers whose proposal lost
        displaced = (
            state.join(accepted, "id", "left_semi")
            .filter(F.col("suitor") != NONE)
            .select(F.col("suitor").alias("id"))
        )
        winners = accepted.select(F.col("new_suitor").alias("prop"))
        rejected = proposals.join(winners, "prop", "left_anti").select(
            F.col("prop").alias("id")
        )
        active = truncate(displaced.unionByName(rejected).distinct(), release=active)
        state = new_state
    matched = (
        state.filter(F.col("suitor") != NONE)
        .select(F.col("id").alias("a"), F.col("suitor").alias("b"))
    )
    mutual = (
        matched.alias("x")
        .join(
            matched.select(F.col("a").alias("b"), F.col("b").alias("a")).alias("y"),
            ["a", "b"],
            "left_semi",
        )
        .filter(F.col("a") < F.col("b"))
        .select(F.col("a").alias("u"), F.col("b").alias("v"))
    )
    out = mutual.join(
        sym.select(F.col("src").alias("u"), F.col("dst").alias("v"), "weight"),
        ["u", "v"],
        "left",
    ).select("u", "v", "weight")
    out = out.persist()
    out.count()
    sym.unpersist()
    return out
