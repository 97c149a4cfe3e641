"""Triangle counting and clustering coefficients via degree-ordered joins.

Reference semantics:
- ClusteringCoefficient::exactGlobal (networkit/cpp/global/
  ClusteringCoefficient.cpp:164-207): per-node triangle count tr(u) counts
  ordered wedges, i.e. each triangle contributes 2 at each corner; global
  coefficient = Σ_u tr(u) / Σ_u deg(u)·(deg(u)-1). Golden fixture: 18/34 on
  the 6-node graph (GlobalGTest.cpp:29-41).
- LocalClusteringCoefficient (networkit/cpp/centrality/
  LocalClusteringCoefficient.cpp:16-94): score[u] = tr(u)/(deg(u)(deg(u)-1));
  its `turbo` mode orients every edge from higher- to lower-degree endpoint
  (tie by id, :25-27) so each triangle is found exactly once, then ×2 —
  exactly the orientation this implementation uses.
- Undirected simple graphs only (no self-loops: LCC ctor throws,
  LocalClusteringCoefficient.cpp:8-13; multi-edges are collapsed first).

Spark plan (the classic two-join enumeration; work bounded by
Σ min(deg)·per-edge ≈ m^1.5 thanks to the orientation, which is the same
trick as the reference's turbo mode — no hub blow-up on power-law graphs):

    ord   = edges oriented (deg,id)-ascending — each triangle a<b<c in
            orientation order appears as (a,b),(b,c),(a,c)
    wedge = ord e1 ⋈ ord e2  ON e1.hi == e2.lo                [shuffle join]
    tri   = wedge ⋈ ord e3   ON (e1.lo, e2.hi) == (e3.lo, e3.hi)
    per-corner counts: explode each triangle's 3 corners → groupBy(id).count

The heavy side (wedges) is generated from the small-degree endpoint, so
degree skew is already bounded; AQE skew-join splitting covers residual
skew in the closing join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from networkit_spark.graph import Graph


def _oriented_edges(graph: Graph) -> tuple[DataFrame, DataFrame]:
    """Returns (ord_edges(lo, hi), degrees(id, degree)) where every simple
    undirected edge appears once, oriented ascending by (degree, id) —
    LocalClusteringCoefficient.cpp:25-27 orientation."""
    simple = graph.simple_undirected_edges()  # (u < v), deduped, no loops
    deg = (
        simple.select(F.col("u").alias("id"))
        .unionByName(simple.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("degree").alias("deg_u"))
    dv = deg.select(F.col("id").alias("v"), F.col("degree").alias("deg_v"))
    ordered = (
        simple.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("deg_u") < F.col("deg_v"))
                | ((F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))),
                F.col("u"),
            ).otherwise(F.col("v")).alias("lo"),
            F.when(
                (F.col("deg_u") < F.col("deg_v"))
                | ((F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))),
                F.col("v"),
            ).otherwise(F.col("u")).alias("hi"),
        )
    )
    return ordered, deg


def triangles(graph: Graph) -> DataFrame:
    """All triangles, once each, as (a, b, c) in orientation order."""
    ordered, _ = _oriented_edges(graph)
    ordered = ordered.persist(StorageLevel.MEMORY_AND_DISK)
    e1 = ordered.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = ordered.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    e3 = ordered.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    wedges = e1.join(e2, "b")
    tri = wedges.join(e3, ["a", "c"], "left_semi").select("a", "b", "c")
    return tri


def triangle_counts(graph: Graph) -> DataFrame:
    """(id, triangles) — triangles incident to each vertex, each counted ONCE
    (reference tr(u) = 2 × this; every vertex present, 0 if none)."""
    tri = triangles(graph)
    corners = (
        tri.select(F.col("a").alias("id"))
        .unionByName(tri.select(F.col("b").alias("id")))
        .unionByName(tri.select(F.col("c").alias("id")))
    )
    cnt = corners.groupBy("id").agg(F.count("*").alias("triangles"))
    return (
        graph.vertices()
        .join(cnt, "id", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"))
    )


def total_triangles(graph: Graph) -> int:
    """Total number of distinct triangles in the graph."""
    return triangles(graph).count()


def global_clustering_coefficient(graph: Graph) -> float:
    """exactGlobal (ClusteringCoefficient.cpp:195-206):
    Σ_u 2·tri(u) / Σ_u deg(u)·(deg(u)-1). 18/34 on the golden fixture."""
    ordered, deg = _oriented_edges(graph)
    tri = triangle_counts(graph)
    num = tri.agg(F.sum(F.col("triangles") * 2)).first()[0] or 0
    den = deg.agg(F.sum(F.col("degree") * (F.col("degree") - 1))).first()[0] or 0
    if den == 0:
        return 0.0
    return num / den


def local_clustering_coefficients(graph: Graph, turbo: bool = True) -> DataFrame:
    """(id, score) — LocalClusteringCoefficient.cpp:82: score[u] =
    2·tri(u) / (deg(u)·(deg(u)-1)); 0 when deg < 2. (`turbo` kept for API
    parity — this plan IS the turbo orientation.)"""
    _, deg = _oriented_edges(graph)
    tri = triangle_counts(graph)
    return (
        graph.vertices()
        .join(deg, "id", "left")
        .join(tri, "id", "left")
        .select(
            "id",
            F.when(
                F.coalesce("degree", F.lit(0)) >= 2,
                2.0
                * F.coalesce("triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
            )
            .otherwise(0.0)
            .alias("score"),
        )
    )
