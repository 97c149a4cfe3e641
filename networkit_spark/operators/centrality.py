"""Non-iterative centralities.

- DegreeCentrality (networkit/cpp/centrality/DegreeCentrality.cpp:16-51):
  score(v) = degree(v), optionally normalized by (n-1). One hash
  aggregation — the trivial centrality, included for API parity.
- EigenvectorCentrality (networkit/cpp/centrality/
  EigenvectorCentrality.cpp): power iteration with L2 normalization per
  step — reuses the engine's iterative driver; convergence when
  ||x_{k+1} − x_k||∞ ≤ tol (reference uses scaled vectors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.iterative import Checkpointer


def degree_centrality(graph: Graph, normalized: bool = False) -> DataFrame:
    """(id, score) — degree (out-degree for directed graphs), 0 for
    isolated vertices; normalized divides by n-1."""
    deg = graph.out_degrees().select("id", F.col("degree").cast("double").alias("score"))
    if normalized:
        n = graph.num_vertices()
        deg = deg.select("id", (F.col("score") / F.lit(float(n - 1))).alias("score"))
    return deg


def eigenvector_centrality(
    graph: Graph, tol: float = 1e-8, max_iterations: int = 100
) -> DataFrame:
    """(id, score) — power iteration on the (symmetrized, weighted)
    adjacency matrix, L2-normalized each superstep."""
    spark = graph.edges.sparkSession
    ckpt = Checkpointer(spark, None, algorithm="eigenvector")
    sym = graph.symmetrized_edges()
    vertices = graph.vertices()
    n = vertices.count()
    x = vertices.select("id", F.lit(1.0 / n**0.5).alias("score"))

    for _ in range(max_iterations):
        gathered = (
            x.join(sym, x.id == sym.src)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("score") * F.col("weight")).alias("raw"))
        )
        new = vertices.join(gathered, "id", "left").select(
            "id", F.coalesce("raw", F.lit(0.0)).alias("raw")
        )
        norm = new.agg(F.sqrt(F.sum(F.pow("raw", 2)))).first()[0] or 1.0
        new = new.select(
            "id",
            (F.col("raw") / F.lit(norm)).alias("score"),
        ).join(x.withColumnRenamed("score", "old"), "id")
        snap = ckpt.save(new, _ + 1, None)
        diff = snap.agg(F.max(F.abs(F.col("score") - F.col("old")))).first()[0]
        x = snap.select("id", "score")
        if diff is not None and diff <= tol:
            break
    ckpt.close()
    return x
