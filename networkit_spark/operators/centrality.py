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
from pyspark.storagelevel import StorageLevel

from networkit_spark.graph import Graph
from networkit_spark.plans.iterative import Checkpointer, truncate


def degree_centrality(graph: Graph, normalized: bool = False) -> DataFrame:
    """(id, score) — degree (out-degree for directed graphs), 0 for
    isolated vertices; normalized divides by n-1."""
    deg = graph.out_degrees().select("id", F.col("degree").cast("double").alias("score"))
    if normalized:
        n = graph.num_vertices()
        deg = deg.select("id", (F.col("score") / F.lit(float(n - 1))).alias("score"))
    return deg


def katz_centrality(
    graph: Graph,
    alpha: float = 5e-4,
    beta: float = 0.1,
    tol: float = 1e-8,
    max_iterations: int = 100,
) -> DataFrame:
    """(id, score) — Katz centrality, reference semantics
    (networkit/cpp/centrality/KatzCentrality.cpp): iterate
    x' = α·(gather over in-edges) + β from x=0, converge on the L2 norm
    of the step, then L2-normalize. Undirected graphs gather over the
    symmetrized table (in ≡ incident)."""
    spark = graph.edges.sparkSession
    ckpt = Checkpointer(spark, None, algorithm="katz")
    edges = graph.edges if graph.directed else graph.symmetrized_edges()
    vertices = graph.vertices()
    x = vertices.select("id", F.lit(0.0).alias("score"))
    for it in range(1, max_iterations + 1):
        gathered = (
            x.join(edges, x.id == edges.src)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("score") * F.col("weight")).alias("g"))
        )
        new = (
            vertices.join(gathered, "id", "left")
            .join(x.withColumnRenamed("score", "old"), "id")
            .select(
                "id",
                (F.lit(alpha) * F.coalesce("g", F.lit(0.0)) + F.lit(beta)).alias("score"),
                "old",
            )
        )
        snap = ckpt.save(new, it, None)
        diff = snap.agg(F.sqrt(F.sum(F.pow(F.col("score") - F.col("old"), 2)))).first()[0]
        x = snap.select("id", "score")
        if diff is not None and diff <= tol:
            break
    norm = x.agg(F.sqrt(F.sum(F.pow("score", 2)))).first()[0] or 1.0
    out = x.select("id", (F.col("score") / F.lit(norm)).alias("score"))
    ckpt.close()
    return out


def core_decomposition(graph: Graph, max_iterations: int = 10000) -> DataFrame:
    """(id, core) — k-core numbers by distributed peeling
    (reference: networkit/cpp/centrality/CoreDecomposition.cpp bucket
    peeling; here: level-synchronous peel — remove all vertices of
    degree ≤ k until none remain at that k, then k+1). Works on the
    simple undirected graph."""
    spark = graph.edges.sparkSession
    ckpt = Checkpointer(spark, None, algorithm="kcore")
    und = graph.simple_undirected_edges().persist(StorageLevel.MEMORY_AND_DISK)
    remaining_v = graph.vertices().transform(truncate)
    remaining_e = und
    out = None
    k = 0
    it = 0
    while remaining_v.limit(1).count() > 0 and it < max_iterations:
        it += 1
        deg = (
            remaining_e.select(F.col("u").alias("id"))
            .unionByName(remaining_e.select(F.col("v").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("d"))
        )
        degs = remaining_v.join(deg, "id", "left").select(
            "id", F.coalesce("d", F.lit(0)).alias("d")
        )
        peel = degs.filter(F.col("d") <= k).select("id").withColumn(
            "core", F.lit(k).cast("long")
        )
        peel = ckpt.save(peel, it, None)
        if peel.limit(1).count() == 0:
            k += 1
            continue
        out = peel if out is None else truncate(out.unionByName(peel), release=out)
        remaining_v = truncate(
            remaining_v.join(peel.select("id"), "id", "left_anti"), release=remaining_v
        )
        remaining_e = truncate(
            remaining_e.join(peel.select(F.col("id").alias("u")), "u", "left_anti")
            .join(peel.select(F.col("id").alias("v")), "v", "left_anti")
            .select("u", "v"),
            release=remaining_e,
        )
    und.unpersist()
    ckpt.close()
    if out is None:
        return graph.vertices().withColumn("core", F.lit(0).cast("long"))
    return out


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
