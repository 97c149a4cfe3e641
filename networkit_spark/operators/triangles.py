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
    """All triangles, once each, as (a, b, c): a is the triangle's
    orientation-minimal vertex ((degree, id) order), b < c by id.

    Wedges are pairs of OUT-neighbors of the orientation-minimal vertex
    (o1 ⋈ o2 on the shared tail — a self-join on one reused hash(lo)
    exchange), so the wedge volume is Σ_v C(out(v), 2), the bound the
    degree orientation exists to guarantee (out(v) = #higher-ordered
    neighbors, small even for hubs). The previous a→b→c path formulation
    joined on the wedge's MIDDLE vertex, whose volume is Σ_b in(b)·out(b)
    — in(hub) ≈ deg(hub) on power-law graphs, which blew the wedge
    shuffle past 60 GiB on a 131M-arc RMAT where this form stays
    pair-bounded. Closure is one left-semi join against the id-ordered
    edge set."""
    ordered, _ = _oriented_edges(graph)
    ordered = ordered.persist(StorageLevel.MEMORY_AND_DISK)
    o1 = ordered.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    o2 = ordered.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    wedges = o1.join(o2, "a").filter(F.col("b") < F.col("c"))
    closing = ordered.select(
        F.least("lo", "hi").alias("b"), F.greatest("lo", "hi").alias("c")
    )
    tri = wedges.join(closing, ["b", "c"], "left_semi").select("a", "b", "c")
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


def triangle_edge_scores(graph: Graph) -> DataFrame:
    """(u, v, triangles) — triangles containing each simple undirected
    edge {u,v} (u < v). Reference: TriangleEdgeScore
    (networkit/cpp/edgescores/TriangleEdgeScore.cpp:18-120); same
    degree-ordered enumeration, scores scattered back to the three edges
    of each triangle. Every edge present, 0 when in no triangle."""
    tri = triangles(graph)
    sides = (
        tri.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .unionByName(tri.select(F.least("b", "c").alias("u"), F.greatest("b", "c").alias("v")))
        .unionByName(tri.select(F.least("a", "c").alias("u"), F.greatest("a", "c").alias("v")))
    )
    cnt = sides.groupBy("u", "v").agg(F.count("*").alias("triangles"))
    return (
        graph.simple_undirected_edges()
        .join(cnt, ["u", "v"], "left")
        .select("u", "v", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"))
    )


def approx_global_clustering_coefficient(graph: Graph, n_samples: int = 10000,
                                         seed: int = 42) -> float:
    """Wedge-sampling estimator (ClusteringCoefficient::approxGlobal,
    networkit/cpp/global/ClusteringCoefficient.cpp:209-270): sample
    wedges proportionally to deg·(deg-1) per pivot, test closure; the
    closed fraction estimates the global coefficient.

    Deterministic: pivots drawn by hashing the sample index against the
    cumulative wedge-count distribution; wedge endpoints drawn by hashed
    index into the pivot's (sorted) adjacency — no RNG state, executors
    regenerate their samples independently."""
    simple = graph.simple_undirected_edges()
    adj = (
        simple.select(F.col("u").alias("id"), F.col("v").alias("nbr"))
        .unionByName(simple.select(F.col("v").alias("id"), F.col("u").alias("nbr")))
    )
    # adjacency arrays + per-pivot wedge counts
    nbrs = adj.groupBy("id").agg(F.sort_array(F.collect_list("nbr")).alias("nbrs"))
    nbrs = nbrs.withColumn("deg", F.size("nbrs")).filter(F.col("deg") >= 2)
    nbrs = nbrs.withColumn("wedges", (F.col("deg") * (F.col("deg") - 1) / 2).cast("long"))
    from networkit_spark.plans.ranking import global_prefix_sums

    # NB: named cum_off, not "offset" — DataFrame.offset() is a method in
    # pyspark 4 and attribute access would resolve to it, not the column.
    # Two-phase exclusive prefix sum (plans/ranking.py) — no global window.
    cum = global_prefix_sums(nbrs, "id", "wedges", out_col="cum_off")
    total_wedges = cum.agg(F.sum("wedges")).first()[0] or 0
    if total_wedges == 0:
        return 0.0

    spark = graph.edges.sparkSession
    samples = spark.range(n_samples).select(
        (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(total_wedges))).alias("widx"),
        F.col("id").alias("sample_id"),
    )
    # pivot = the vertex whose cumulative wedge range contains widx
    picked = samples.join(
        cum,
        (samples.widx >= cum.cum_off) & (samples.widx < cum.cum_off + cum.wedges),
    )
    # unrank wedge (i, j) within the pivot: i < j over deg neighbors
    picked = picked.select(
        "sample_id",
        "nbrs",
        "deg",
        (F.col("widx") - F.col("cum_off")).alias("k"),
    )
    # linear unranking: i = floor(((2d-1) - sqrt((2d-1)^2 - 8k)) / 2)
    d = F.col("deg").cast("double")
    k = F.col("k").cast("double")
    i = F.floor(((2 * d - 1) - F.sqrt((2 * d - 1) * (2 * d - 1) - 8 * k)) / 2)
    j = (F.col("k") - i * (2 * d - i - 1) / 2 + i + 1).cast("long")
    wedge = picked.select(
        "sample_id",
        F.element_at("nbrs", (i + 1).cast("int")).alias("x"),
        F.element_at("nbrs", (j + 1).cast("int")).alias("y"),
    )
    closed = wedge.join(
        simple,
        (F.least("x", "y") == F.col("u")) & (F.greatest("x", "y") == F.col("v")),
        "left_semi",
    ).count()
    return closed / n_samples


def extract_largest_connected_component(graph: Graph, compact: bool = False) -> Graph:
    """ConnectedComponents::extractLargestConnectedComponent
    (ConnectedComponentsImpl.cpp:71-95): induced subgraph on the biggest
    component; compact=True relabels ids to 0..n-1."""
    from networkit_spark.graphtools import compact_graph, subgraph_from_nodes
    from networkit_spark.operators.components import connected_components

    res = connected_components(graph)
    top = (
        res.component_sizes().orderBy(F.desc("size"), F.asc("label")).limit(1)
        .select("label")
    )
    members = res.labels.join(F.broadcast(top), "label").select("id")
    sub = subgraph_from_nodes(graph, members)
    return compact_graph(sub) if compact else sub


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
