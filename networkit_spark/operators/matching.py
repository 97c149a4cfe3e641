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
