"""Cover (overlapping-clustering) quality and comparison measures.

Reference semantics:
- CoverF1Similarity (networkit/cpp/community/CoverF1Similarity.cpp:9-99):
  per cluster of C, the best F1 against any overlapping reference
  cluster (precision = overlap/|ref|, recall = overlap/|C_i|); summary =
  unweighted average over clusters, weighted average over memberships,
  min, max.
- CoverHubDominance (CoverHubDominance.cpp:8-79): per cluster, the
  maximum cluster-internal degree divided by (size-1) (1 for
  singletons); same summary.
- OverlappingNMIDistance (OverlappingNMIDistance.cpp:12-214, McDaid et
  al. "Normalized Mutual Information to evaluate overlapping community
  finding algorithms"): per-cluster best adjusted conditional entropy,
  MI = ((H(X)-H(X|Y)) + (H(Y)-H(Y|X)))/2, normalized by
  min/geometric/arithmetic/max/joint-entropy; returns 1 - NMI.

Everything is plain joins + aggregations over membership tables
(id, c) — one shuffle per aggregation, exact SQL twins in oracles.py.
A cover is any (id, c) DataFrame; a node may appear in many clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SUMMARY = ("unweighted_avg", "weighted_avg", "min_value", "max_value",
            "n_clusters")


def _summarize(values: DataFrame, value_col: str, size_col: str) -> DataFrame:
    """LocalCommunityEvaluation summary contract
    (LocalCoverEvaluation rollup in both reference measures)."""
    return values.agg(
        F.round(F.avg(value_col), 9).alias("unweighted_avg"),
        F.round(F.sum(F.col(value_col) * F.col(size_col)) / F.sum(size_col), 9)
         .alias("weighted_avg"),
        F.round(F.min(value_col), 9).alias("min_value"),
        F.round(F.max(value_col), 9).alias("max_value"),
        F.count("*").cast("long").alias("n_clusters"),
    )


def cover_f1_similarity(cover: DataFrame, reference: DataFrame) -> DataFrame:
    """One summary row. cover/reference: (id, c) membership tables."""
    csize = cover.groupBy("c").agg(F.count("*").alias("cs"))
    rsize = reference.groupBy(F.col("c").alias("s")).agg(F.count("*").alias("rs"))
    overlap = (
        cover.join(reference.select("id", F.col("c").alias("s")), "id")
        .groupBy("c", "s")
        .agg(F.count("*").alias("ol"))
    )
    f1 = (
        overlap.join(csize, "c").join(rsize, "s")
        .withColumn("prec", F.col("ol") / F.col("rs"))
        .withColumn("rec", F.col("ol") / F.col("cs"))
        .withColumn("f1", 2 * F.col("prec") * F.col("rec")
                    / (F.col("prec") + F.col("rec")))
        .groupBy("c")
        .agg(F.max("f1").alias("best"))
    )
    vals = (
        csize.join(f1, "c", "left")
        .select("c", "cs", F.coalesce("best", F.lit(0.0)).alias("best"))
    )
    return _summarize(vals, "best", "cs")


def cover_hub_dominance(graph, cover: DataFrame) -> DataFrame:
    """One summary row; internal degree counts neighbors sharing the
    cluster (CoverHubDominance.cpp:17-28)."""
    sym = graph.symmetrized_edges().filter(F.col("src") != F.col("dst"))
    internal = (
        cover.select(F.col("id").alias("src"), "c")
        .join(sym.select("src", "dst"), "src")
        .join(cover.select(F.col("id").alias("dst"), F.col("c").alias("c2")),
              "dst")
        .filter(F.col("c") == F.col("c2"))
        .groupBy("c", "src")
        .agg(F.count("*").alias("ideg"))
        .groupBy("c")
        .agg(F.max("ideg").alias("maxdeg"))
    )
    csize = cover.groupBy("c").agg(F.count("*").alias("cs"))
    vals = (
        csize.join(internal, "c", "left")
        .select(
            "c", "cs",
            F.when(F.col("cs") > 1,
                   F.coalesce("maxdeg", F.lit(0)) / (F.col("cs") - 1.0))
            .otherwise(F.lit(1.0)).alias("dom"),
        )
    )
    return _summarize(vals, "dom", "cs")


def _h(w, n):
    # -w * log2(w/n) for w > 0 else 0
    return F.when(w > 0, -w * F.log2(w / F.lit(float(n)))).otherwise(0.0)


def _cond_entropy(x: DataFrame, y: DataFrame, n: int) -> DataFrame:
    """H(X_i|Y) per cluster i of x: min over intersecting Y_j of the
    ADJUSTED conditional entropy, floored at H(X_i)
    (OverlappingNMIDistance.cpp:62-120). Returns (i, hx_i, cond)."""
    xs = x.groupBy(F.col("c").alias("i")).agg(F.count("*").alias("xi"))
    ys = y.groupBy(F.col("c").alias("j")).agg(F.count("*").alias("yj"))
    inter = (
        x.select("id", F.col("c").alias("i"))
        .join(y.select("id", F.col("c").alias("j")), "id")
        .groupBy("i", "j")
        .agg(F.count("*").alias("d"))
    )
    a = F.lit(n) + F.col("d") - F.col("xi") - F.col("yj")
    b = F.col("yj") - F.col("d")
    c = F.col("xi") - F.col("d")
    d = F.col("d")
    star = (
        inter.join(xs, "i").join(ys, "j")
        .withColumn("hxy", _h(a, n) + _h(b, n) + _h(c, n) + _h(d, n))
        .withColumn("hy", _h(F.col("yj"), n) + _h(F.lit(n) - F.col("yj"), n))
        .withColumn("hx", _h(F.col("xi"), n) + _h(F.lit(n) - F.col("xi"), n))
        .withColumn(
            "hstar",
            F.when(_h(a, n) + _h(d, n) >= _h(b, n) + _h(c, n),
                   F.col("hxy") - F.col("hy")).otherwise(F.col("hx")),
        )
        .groupBy("i")
        .agg(F.min("hstar").alias("mn"))
    )
    withhx = xs.select(
        "i", (_h(F.col("xi"), n) + _h(F.lit(n) - F.col("xi"), n)).alias("hx_i")
    )
    return withhx.join(star, "i", "left").select(
        "i", "hx_i", F.least("hx_i", F.coalesce("mn", "hx_i")).alias("cond")
    )


def overlapping_nmi_distance(n: int, x: DataFrame, y: DataFrame) -> DataFrame:
    """One row with the dissimilarity 1-NMI under every normalization
    (min, geometric_mean, arithmetic_mean, max, joint_entropy) — the
    reference's Normalization enum as columns. n = number of graph
    nodes (covers need not touch every node)."""
    cx = _cond_entropy(x, y, n).agg(
        F.sum("hx_i").alias("hx"), F.sum("cond").alias("hxgy"))
    cy = _cond_entropy(y, x, n).agg(
        F.sum("hx_i").alias("hy"), F.sum("cond").alias("hygx"))
    base = cx.crossJoin(cy).select(
        "hx", "hy",
        (0.5 * ((F.col("hx") - F.col("hxgy"))
                + (F.col("hy") - F.col("hygx")))).alias("mi"),
    )
    hx, hy, mi = F.col("hx"), F.col("hy"), F.col("mi")
    mi = F.greatest(F.least(mi, F.least(hx, hy)), F.lit(0.0))  # clamp
    both_zero = (F.col("hx") == 0.0) & (F.col("hy") == 0.0)

    def nmi(denom, zero_is_zero: bool):
        val = F.when(both_zero, F.lit(1.0))
        if zero_is_zero:
            val = val.when((F.col("hx") == 0.0) | (F.col("hy") == 0.0),
                           F.lit(0.0))
        return F.round(1.0 - val.otherwise(mi / denom), 9)

    return base.select(
        nmi(F.least(hx, hy), True).alias("dist_min"),
        nmi(F.sqrt(hx * hy), True).alias("dist_geometric_mean"),
        nmi((hx + hy) / 2.0, False).alias("dist_arithmetic_mean"),
        nmi(F.greatest(hx, hy), False).alias("dist_max"),
        nmi(hx + hy - mi, False).alias("dist_joint_entropy"),
    )
