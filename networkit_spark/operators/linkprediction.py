"""Link prediction: candidate generation + neighborhood indices.

Reference: networkit/cpp/linkprediction/ —
- MissingLinksFinder.cpp:18-75: candidate pairs u<v at EXACT hop
  distance k (BFS layers from every node, pairs first reached at hop k);
- CommonNeighborsIndex.hpp:29-31, JaccardIndex, AdamicAdarIndex,
  ResourceAllocationIndex.cpp:13-21, PreferentialAttachmentIndex: the
  classic neighborhood scores over a node pair.

Spark shape:
- k=2 (THE link-prediction candidate set): one wedge self-join on the
  symmetrized edge table + left-anti against existing edges — no BFS,
  no per-source state; this is the 100 TB path (the wedge join is the
  same bounded plan as triangle counting).
- k>2: reuses the batched multi-source BFS (distance-module plan) and
  filters dist == k — exact parity with findAtDistance for any k, cost
  O(n·m) like the reference's loop over sources.
- all five indices come out of ONE aggregation over the common-neighbor
  wedge (plus a broadcast-degree join): no per-index passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph


def missing_links(graph: Graph, k: int = 2) -> DataFrame:
    """(u, v) — node pairs u < v at exact distance k (no edge between
    them for k >= 2 by definition). MissingLinksFinder.findAtDistance
    parity."""
    if k < 1:
        raise ValueError("k must be >= 1")
    sym = graph.symmetrized_edges().select("src", "dst")
    und = sym.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    if k == 1:
        return und
    if k == 2:
        a = sym.select(F.col("src").alias("u"), F.col("dst").alias("w"))
        b = sym.select(F.col("src").alias("w"), F.col("dst").alias("v"))
        cand = (
            a.join(b, "w")
            .filter(F.col("u") < F.col("v"))
            .select("u", "v")
            .distinct()
        )
        return cand.join(und, ["u", "v"], "left_anti")
    from networkit_spark.operators.distances import multi_source_bfs

    dists = multi_source_bfs(graph, graph.vertices().select(F.col("id").alias("s")))
    return dists.filter(
        (F.col("dist") == k) & (F.col("s") < F.col("id"))
    ).select(F.col("s").alias("u"), F.col("id").alias("v"))


def link_prediction_scores(graph: Graph, pairs: DataFrame) -> DataFrame:
    """(u, v, common_neighbors, jaccard, adamic_adar,
    resource_allocation, pref_attachment) for each candidate pair.

    One wedge aggregation computes every common-neighbor statistic
    (CN = count, AA = Σ 1/ln deg w, RA = Σ 1/deg w); Jaccard and
    preferential attachment need only the endpoint degrees
    (|Γu ∪ Γv| = deg u + deg v − CN on simple graphs). Pairs with no
    common neighbor score 0 like the reference (empty intersection)."""
    sym = graph.symmetrized_edges().select("src", "dst")
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("double").alias("deg")
    )
    nu = sym.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    nv = sym.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    common = (
        pairs.join(nu, "u")
        .join(nv, ["v", "w"])
        .join(deg.select(F.col("id").alias("w"), F.col("deg").alias("dw")), "w")
        .groupBy("u", "v")
        .agg(
            F.count("*").cast("long").alias("common_neighbors"),
            F.sum(1.0 / F.log("dw")).alias("adamic_adar"),
            F.sum(1.0 / F.col("dw")).alias("resource_allocation"),
        )
    )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    return (
        pairs.join(common, ["u", "v"], "left")
        .join(du, "u", "left")
        .join(dv, "v", "left")
        .select(
            "u",
            "v",
            F.coalesce("common_neighbors", F.lit(0)).alias("common_neighbors"),
            F.when(
                F.coalesce("du", F.lit(0.0)) + F.coalesce("dv", F.lit(0.0))
                - F.coalesce("common_neighbors", F.lit(0)) > 0,
                F.coalesce("common_neighbors", F.lit(0))
                / (
                    F.coalesce("du", F.lit(0.0))
                    + F.coalesce("dv", F.lit(0.0))
                    - F.coalesce("common_neighbors", F.lit(0))
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("jaccard"),
            F.coalesce("adamic_adar", F.lit(0.0)).alias("adamic_adar"),
            F.coalesce("resource_allocation", F.lit(0.0)).alias(
                "resource_allocation"
            ),
            (F.coalesce("du", F.lit(0.0)) * F.coalesce("dv", F.lit(0.0))).alias(
                "pref_attachment"
            ),
        )
    )
