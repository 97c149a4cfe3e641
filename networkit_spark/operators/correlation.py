"""Assortativity (attribute Pearson / nominal mixing-matrix variants).

Reference: networkit/cpp/correlation/Assortativity.cpp:33-103.
- Continuous attribute (:72-100): r = Pearson correlation of the edge
  endpoint attribute pairs (x_u, y_v) with means taken over edges:
      x̄ = Σ_E x_u / m,  ȳ = Σ_E y_v / m
      r = Σ(x−x̄)(y−ȳ) / sqrt(Σ(x−x̄)² · Σ(y−ȳ)²)
- Nominal / partition (:34-70): k×k mixing matrix E with e_ij = fraction
  of edges from type i to type j (undirected edges mirrored across the
  diagonal, :44-46), row/col sums a_i, b_j;
      r = (Σ_i e_ii − Σ_i a_i·b_i) / (1 − Σ_i a_i·b_i)

Edge orientation: the reference iterates each undirected edge once in
storage order (forEdges); this engine uses the canonical (min, max)
orientation — deterministic, and identical whenever the formula is
orientation-symmetric (nominal variant always; continuous variant up to
the usual directionality caveat, which the reference shares).

Spark shape: everything is one or two hash aggregations over the edge
table joined with a vertex-attribute table — no iteration, no UDFs;
Catalyst fuses the mean pass and the moment pass into two scans (or one,
when the attribute join is broadcast)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph


def _edge_pairs(graph: Graph) -> DataFrame:
    """Each edge once: directed = arcs as stored; undirected = canonical
    (min, max) orientation (self-loops kept once, like forEdges)."""
    if graph.directed:
        return graph.edges.select("src", "dst")
    e = graph.edges
    return (
        e.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .dropDuplicates(["src", "dst"])
    )


def attribute_assortativity(graph: Graph, attributes: DataFrame) -> float:
    """Pearson r over edge endpoint pairs; attributes = (id, value)."""
    pairs = _edge_pairs(graph)
    xs = attributes.select(F.col("id").alias("src"), F.col("value").alias("x"))
    ys = attributes.select(F.col("id").alias("dst"), F.col("value").alias("y"))
    el = pairs.join(xs, "src").join(ys, "dst")
    means = el.agg(
        F.avg("x").alias("xm"), F.avg("y").alias("ym")
    ).first()
    xm, ym = means["xm"], means["ym"]
    row = el.agg(
        F.sum((F.col("x") - xm) * (F.col("y") - ym)).alias("a"),
        F.sum(F.pow(F.col("x") - xm, 2)).alias("b"),
        F.sum(F.pow(F.col("y") - ym, 2)).alias("c"),
    ).first()
    denom = (row["b"] * row["c"]) ** 0.5
    return float(row["a"] / denom) if denom > 0 else float("nan")


def degree_assortativity(graph: Graph) -> float:
    """Assortativity of the degree attribute (the common use)."""
    deg = graph.out_degrees().select(
        "id", F.col("degree").cast("double").alias("value")
    )
    return attribute_assortativity(graph, deg)


def nominal_assortativity(graph: Graph, labels: DataFrame) -> float:
    """Mixing-matrix assortativity over a partition (Assortativity.cpp:34-70)."""
    pairs = _edge_pairs(graph)
    lu = labels.select(F.col("id").alias("src"), F.col("label").alias("lu"))
    lv = labels.select(F.col("id").alias("dst"), F.col("label").alias("lv"))
    el = pairs.join(lu, "src").join(lv, "dst")
    m = el.count()
    cells = el.groupBy("lu", "lv").agg(F.count("*").cast("double").alias("cnt"))
    if not graph.directed:
        mirrored = cells.filter(F.col("lu") != F.col("lv")).select(
            F.col("lv").alias("lu"), F.col("lu").alias("lv"), "cnt"
        )
        cells = cells.unionByName(mirrored).groupBy("lu", "lv").agg(
            F.sum("cnt").alias("cnt")
        )
    e = cells.select("lu", "lv", (F.col("cnt") / float(m)).alias("e"))
    diag = (
        e.filter(F.col("lu") == F.col("lv")).agg(F.sum("e")).first()[0] or 0.0
    )
    a = e.groupBy("lu").agg(F.sum("e").alias("a"))
    b = e.groupBy("lv").agg(F.sum("e").alias("b"))
    ab = (
        a.join(b, a.lu == b.lv)
        .agg(F.sum(F.col("a") * F.col("b")))
        .first()[0]
        or 0.0
    )
    if ab == 1.0:
        return float("nan")  # all mass on one type: undefined (0/0)
    return float((diag - ab) / (1.0 - ab))
