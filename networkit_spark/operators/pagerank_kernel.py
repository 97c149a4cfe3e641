"""Arrow gather-scatter PageRank kernel — the pandas-UDF physical strategy
named by the north star, alternative to the pure join-agg plan in
operators/pagerank.py (which remains the correctness oracle).

Plan per superstep:
  1. ranks ⋈ edges_norm on src         (the unavoidable gather join)
  2. groupBy(pmod(xxhash64(src), P))   → applyInPandas kernel: inside each
     partition-block, a CSR-style scatter `np.add.at(acc, dst_codes,
     score*frac)` produces per-block partial sums — the map-side combine
     expressed as a vectorized numpy kernel over an Arrow batch
  3. groupBy(dst).sum(partial)         (tiny final agg: ≤ P rows per dst)
  4. join onto vertices + teleport

When to use which: the JVM join-agg path wins when whole-stage codegen
keeps up (it usually does — hash aggregation IS a scatter); the Arrow
kernel wins when the per-edge work grows beyond a multiply-add (e.g.
personalized vectors, multiple scores per vertex — numpy amortizes the
Python boundary across the batch). Both produce bit-identical sums up to
FP reassociation; tests assert allclose(1e-12) against join-agg.

Scale notes: the Arrow transfer moves each edge message once (same volume
as the shuffle it replaces); maxRecordsPerBatch bounds kernel memory;
the partition key is the same hash-partitioning the edge table is stored
in, so step 2 adds NO extra shuffle beyond the gather join's.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from networkit_spark.graph import Graph
from networkit_spark.plans.iterative import truncate


def _scatter_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """One partition-block: per-dst partial sums via vectorized scatter."""
    dst_codes, uniques = pd.factorize(pdf["dst"], sort=False)
    acc = np.zeros(len(uniques))
    np.add.at(acc, dst_codes, (pdf["score"] * pdf["frac"]).to_numpy())
    return pd.DataFrame({"id": uniques, "partial": acc})


def pagerank_arrow(
    graph: Graph,
    n_iter: int,
    damp: float = 0.85,
    num_blocks: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank via the Arrow gather-scatter kernel.
    Matches pagerank_fixed(..., distribute_sinks=DISTRIBUTE_SINKS)
    semantics on sink-free graphs, allclose(1e-12) otherwise up to FP
    reassociation of the partial sums."""
    spark = graph.edges.sparkSession
    P = num_blocks or spark.sparkContext.defaultParallelism

    vertices = graph.vertices().persist(StorageLevel.MEMORY_AND_DISK)
    n = vertices.count()
    teleport = (1.0 - damp) / n
    factor = damp / n

    deg = graph.edges.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("deg"))
    edges_norm = (
        graph.edges.join(deg, graph.edges.src == deg.id)
        .select(
            "src",
            "dst",
            (F.col("weight") / F.col("deg")).alias("frac"),
            F.pmod(F.xxhash64("src"), F.lit(P)).alias("block"),
        )
        .repartition(P, "block")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges_norm.count()

    handle_sinks = graph.directed
    sinks = vertices.join(
        graph.edges.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if sinks.count() == 0:
        handle_sinks = False

    ranks = vertices.select("id", F.lit(1.0 / n).alias("score"))
    for _ in range(n_iter):
        gathered = ranks.join(edges_norm, ranks.id == edges_norm.src).select(
            "block", "dst", "score", "frac"
        )
        partials = gathered.groupBy("block").applyInPandas(
            lambda pdf: _scatter_kernel(pdf), schema="id long, partial double"
        )
        contribs = partials.groupBy("id").agg(F.sum("partial").alias("contrib"))
        new = vertices.join(contribs, "id", "left").select(
            "id",
            (F.lit(teleport) + F.lit(damp) * F.coalesce("contrib", F.lit(0.0))).alias(
                "score"
            ),
        )
        if handle_sinks:
            sink_mass = ranks.join(sinks, "id", "left_semi").agg(
                F.coalesce(F.sum("score"), F.lit(0.0)).alias("sink_mass")
            )
            new = new.crossJoin(F.broadcast(sink_mass)).select(
                "id",
                (F.col("score") + F.lit(factor) * F.col("sink_mass")).alias("score"),
            )
        ranks = truncate(new, release=ranks if _ > 0 else None)

    vertices.unpersist()
    edges_norm.unpersist()
    sinks.unpersist()
    return ranks
