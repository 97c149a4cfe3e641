"""Partition evaluation + comparison measures (the reference's
community-measure family):

- EdgeCut (cpp/community/EdgeCut.cpp:12-20)
- PartitionHubDominance (cpp/community/PartitionHubDominance.cpp:15-70;
  HubDominance.getQuality returns its unweighted average — the
  reference's weightedAverage accumulator uses `=` instead of `+=`,
  a bug we do not replicate; we expose the per-cluster values +
  unweighted average only)
- IntrapartitionDensity (cpp/community/IntrapartitionDensity.cpp:10-60)
- IsolatedInterpartitionConductance / -Expansion
  (cpp/community/IsolatedInterpartition{Conductance,Expansion}.cpp)
- PartitionFragmentation (cpp/community/PartitionFragmentation.cpp:10-70)
- StablePartitionNodes (cpp/community/StablePartitionNodes.cpp:10-75)
- Comparison: NodeStructuralRandMeasure, GraphStructuralRandMeasure,
  JaccardMeasure, AdjustedRandMeasure (all reduce to the pair-count
  sums over zeta / eta / intersection cell sizes), PartitionIntersection.

Spark shape: every measure is one or two labeled joins + hash
aggregations over the edge or vertex table — no iteration except
PartitionFragmentation, which runs the engine's hash-min connected
components on the intra-cluster subgraph (inter-cluster edges filtered
BEFORE the CC loop, so the frontier never carries cross-community
traffic). Summaries collapse to a per-cluster table + one global agg.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.quality import _edge_labels


@dataclass
class EvalSummary:
    values: DataFrame  # (label, value)
    unweighted_average: float
    weighted_average: float
    minimum: float
    maximum: float


def _summary(values: DataFrame, sizes: DataFrame, n: int) -> EvalSummary:
    """Reference LocalPartitionEvaluation rollup: unweighted mean over
    clusters, size-weighted mean over nodes, min, max."""
    row = (
        values.join(sizes, "label")
        .agg(
            F.avg("value").alias("ua"),
            (F.sum(F.col("value") * F.col("size")) / F.lit(float(n))).alias("wa"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .first()
    )
    return EvalSummary(
        values=values,
        unweighted_average=float(row["ua"]),
        weighted_average=float(row["wa"]),
        minimum=float(row["mn"]),
        maximum=float(row["mx"]),
    )


def _sizes(graph: Graph, labels: DataFrame) -> DataFrame:
    return (
        graph.vertices()
        .join(labels, "id")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("size"))
    )


def edge_cut(graph: Graph, labels: DataFrame) -> float:
    """Total weight of inter-community edges (EdgeCut.cpp:12-20)."""
    el = _edge_labels(graph, labels)
    row = el.filter(F.col("lu") != F.col("lv")).agg(F.sum("weight")).first()
    return float(row[0] or 0.0)


def partition_hub_dominance(graph: Graph, labels: DataFrame) -> EvalSummary:
    """Per cluster: max internal degree / (size - 1); singletons get 1
    (PartitionHubDominance.cpp:19-56)."""
    lab = labels.select("id", "label")
    arcs = graph.edges.select("src", "dst")
    internal = (
        arcs.join(lab.select(F.col("id").alias("src"), F.col("label").alias("lu")), "src")
        .join(lab.select(F.col("id").alias("dst"), F.col("label").alias("lv")), "dst")
        .filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("src").alias("id"), F.col("lu").alias("label"))
        .agg(F.count(F.lit(1)).alias("ideg"))
        .groupBy("label")
        .agg(F.max("ideg").alias("max_ideg"))
    )
    sizes = _sizes(graph, labels)
    values = sizes.join(internal, "label", "left").select(
        "label",
        F.when(
            F.col("size") > 1,
            F.coalesce("max_ideg", F.lit(0)).cast("double") / (F.col("size") - 1),
        )
        .otherwise(1.0)
        .alias("value"),
    )
    return _summary(values, sizes, graph.num_vertices())


def intrapartition_density(
    graph: Graph, labels: DataFrame
) -> tuple[EvalSummary, float]:
    """Per cluster: intra edges / (s·(s−1)/2), 1 when no pair exists;
    plus the global ratio Σ intra / Σ possible
    (IntrapartitionDensity.cpp:10-60). Returns (summary, global)."""
    el = _edge_labels(graph, labels)
    intra = (
        el.filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("label"))
        .agg(F.count(F.lit(1)).alias("intra"))
    )
    sizes = _sizes(graph, labels)
    per = sizes.join(intra, "label", "left").select(
        "label",
        "size",
        F.coalesce("intra", F.lit(0)).alias("intra"),
        (F.col("size") * (F.col("size") - 1) / 2).cast("long").alias("possible"),
    )
    values = per.select(
        "label",
        F.when(
            F.col("possible") > 0, F.col("intra").cast("double") / F.col("possible")
        )
        .otherwise(1.0)
        .alias("value"),
    )
    tot = per.agg(F.sum("intra").alias("i"), F.sum("possible").alias("p")).first()
    glob = float(tot["i"]) / float(tot["p"]) if tot["p"] else 1.0
    return _summary(values, sizes, graph.num_vertices()), glob


def _cluster_cut_vol(graph: Graph, labels: DataFrame):
    el = _edge_labels(graph, labels)
    both = el.select(F.col("lu").alias("label"), "weight", (F.col("lu") != F.col("lv")).alias("x")).unionByName(
        el.select(F.col("lv").alias("label"), "weight", (F.col("lu") != F.col("lv")).alias("x"))
    )
    return both.groupBy("label").agg(
        F.sum(F.when(F.col("x"), F.col("weight")).otherwise(0.0)).alias("cut"),
        F.sum("weight").alias("vol"),
    )


def isolated_interpartition_conductance(
    graph: Graph, labels: DataFrame
) -> EvalSummary:
    """Per cluster: cut / min(vol, totalVol − vol), 0 when the
    denominator is 0 (IsolatedInterpartitionConductance.cpp:10-60;
    volume counts each edge at both endpoints — self-loops twice)."""
    cv = _cluster_cut_vol(graph, labels)
    total_vol = float(cv.agg(F.sum("vol")).first()[0] or 0.0)
    sizes = _sizes(graph, labels)
    values = sizes.join(cv, "label", "left").select(
        "label",
        F.when(
            F.least(F.coalesce("vol", F.lit(0.0)), F.lit(total_vol) - F.coalesce("vol", F.lit(0.0))) > 0,
            F.coalesce("cut", F.lit(0.0))
            / F.least(F.col("vol"), F.lit(total_vol) - F.col("vol")),
        )
        .otherwise(0.0)
        .alias("value"),
    )
    return _summary(values, sizes, graph.num_vertices())


def isolated_interpartition_expansion(
    graph: Graph, labels: DataFrame
) -> EvalSummary:
    """Per cluster: cut / min(size, n − size)
    (IsolatedInterpartitionExpansion.cpp:10-45); 0 when the denominator
    is 0 (single all-graph cluster — the reference divides by zero
    there; its tests avoid it)."""
    cv = _cluster_cut_vol(graph, labels)
    sizes = _sizes(graph, labels)
    n = graph.num_vertices()
    values = sizes.join(cv, "label", "left").select(
        "label",
        F.when(
            F.least(F.col("size"), F.lit(n) - F.col("size")) > 0,
            F.coalesce("cut", F.lit(0.0))
            / F.least(F.col("size"), F.lit(n) - F.col("size")).cast("double"),
        )
        .otherwise(0.0)
        .alias("value"),
    )
    return _summary(values, sizes, n)


def partition_fragmentation(graph: Graph, labels: DataFrame) -> EvalSummary:
    """Per cluster: 1 − (largest connected fragment / cluster size)
    (PartitionFragmentation.cpp:10-70) — fragments = connected
    components of the graph with inter-cluster edges removed."""
    from networkit_spark.operators.components import connected_components

    lab = labels.select("id", "label")
    el = _edge_labels(graph, lab).filter(F.col("lu") == F.col("lv"))
    intra = graph._with_edges(
        el.select(F.col("u").alias("src"), F.col("v").alias("dst"), "weight")
        .unionByName(
            el.filter(F.col("u") != F.col("v")).select(
                F.col("v").alias("src"), F.col("u").alias("dst"), "weight"
            )
        ),
        vertices=graph.vertices(),
    )
    cc = connected_components(intra).labels.withColumnRenamed("label", "frag")
    frag_sizes = (
        lab.join(cc, "id")
        .groupBy("label", "frag")
        .agg(F.count(F.lit(1)).alias("fs"))
        .groupBy("label")
        .agg(F.max("fs").alias("max_frag"))
    )
    sizes = _sizes(graph, lab)
    values = sizes.join(frag_sizes, "label").select(
        "label",
        (1.0 - F.col("max_frag").cast("double") / F.col("size")).alias("value"),
    )
    return _summary(values, sizes, graph.num_vertices())


def stable_partition_nodes(
    graph: Graph, labels: DataFrame
) -> tuple[DataFrame, EvalSummary]:
    """(stable flags, per-cluster stable-fraction summary)
    (StablePartitionNodes.cpp:10-75): a node is stable iff it is
    isolated, or its own-label neighbor weight is positive and STRICTLY
    larger than the weight to every other label. weighted_average =
    global stable fraction."""
    lab = labels.select("id", "label")
    arcs = graph.edges.select("src", "dst", "weight")
    lw = (
        arcs.join(lab.select(F.col("id").alias("src"), F.col("label").alias("lu")), "src")
        .join(lab.select(F.col("id").alias("dst"), F.col("label").alias("lv")), "dst")
        .groupBy(F.col("src").alias("id"), F.col("lv"))
        .agg(F.sum("weight").alias("w"), F.max(F.col("lu") == F.col("lv")).alias("own"))
    )
    per_node = lw.groupBy("id").agg(
        F.coalesce(F.max(F.when(F.col("own"), F.col("w"))), F.lit(0.0)).alias("w_own"),
        F.coalesce(F.max(F.when(~F.col("own"), F.col("w"))), F.lit(0.0)).alias("w_max_other"),
    )
    stable = (
        graph.vertices()
        .join(per_node, "id", "left")
        .select(
            "id",
            F.when(F.col("w_own").isNull(), F.lit(True))  # isolated
            .otherwise(
                (F.col("w_own") > 0) & (F.col("w_max_other") < F.col("w_own"))
            )
            .alias("stable"),
        )
    )
    sizes = _sizes(graph, labels)
    values = (
        lab.join(stable, "id")
        .groupBy("label")
        .agg(F.avg(F.col("stable").cast("double")).alias("value"))
    )
    summary = _summary(values, sizes, graph.num_vertices())
    n = graph.num_vertices()
    stable_count = stable.filter("stable").count()
    summary.weighted_average = stable_count / n if n else 0.0
    return stable, summary


# ------------------------------------------------------------- comparison
def _pair_sums(graph: Graph, zeta: DataFrame, eta: DataFrame):
    """(n, sum_zeta, sum_eta, sum_intersection) — pair counts s·(s−1)/2
    over cluster sizes of zeta, eta, and their intersection
    (PartitionIntersection.cpp product cells)."""
    za = zeta.select("id", F.col("label").alias("la"))
    eb = eta.select("id", F.col("label").alias("lb"))
    both = graph.vertices().join(za, "id").join(eb, "id")
    n = both.count()

    def pair_sum(df, *cols):
        return int(
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("s"))
            .agg(F.sum(F.col("s") * (F.col("s") - 1) / 2))
            .first()[0]
            or 0
        )

    return (
        n,
        pair_sum(both, "la"),
        pair_sum(both, "lb"),
        pair_sum(both, "la", "lb"),
    )


def node_structural_rand(graph: Graph, zeta: DataFrame, eta: DataFrame) -> float:
    """NodeStructuralRandMeasure.cpp:13-60 dissimilarity."""
    n, sz, se, si = _pair_sums(graph, zeta, eta)
    a = n * (n - 1.0) / 2.0 + 2.0 * si - (sz + se)
    return 1.0 - (2.0 * a) / (n * (n - 1.0))


def jaccard_measure(graph: Graph, zeta: DataFrame, eta: DataFrame) -> float:
    """JaccardMeasure.cpp:13-62 dissimilarity."""
    n, sz, se, si = _pair_sums(graph, zeta, eta)
    s00 = n * (n - 1.0) / 2.0 + si - (sz + se)
    divisor = n * (n - 1.0) - 2.0 * s00
    return 1.0 - (2.0 * si) / divisor if divisor > 0 else 0.0


def adjusted_rand(graph: Graph, zeta: DataFrame, eta: DataFrame) -> float:
    """AdjustedRandMeasure.cpp:13-55 dissimilarity."""
    n, sz, se, si = _pair_sums(graph, zeta, eta)
    denominator = n * (n - 1) // 2
    max_index = 0.5 * (sz + se)
    expected = (sz * se) / denominator
    if max_index == 0 or max_index == expected:
        return 0.0
    return 1.0 - (si - expected) / (max_index - expected)


def graph_structural_rand(graph: Graph, zeta: DataFrame, eta: DataFrame) -> float:
    """GraphStructuralRandMeasure.cpp:12-40: 1 − (e11 + e00)/m over the
    edge set (agreeing connected pairs)."""
    za = zeta.select("id", F.col("label").alias("x"))
    eb = eta.select("id", F.col("label").alias("y"))
    el = _edge_labels(graph, za.withColumnRenamed("x", "label"))
    el = (
        el.withColumnRenamed("lu", "xu")
        .withColumnRenamed("lv", "xv")
        .join(eb.select(F.col("id").alias("u"), F.col("y").alias("yu")), "u")
        .join(eb.select(F.col("id").alias("v"), F.col("y").alias("yv")), "v")
    )
    m = el.count()
    if m == 0:
        raise ValueError("graph_structural_rand is undefined without edges")
    agree = el.filter(
        ((F.col("xu") == F.col("xv")) & (F.col("yu") == F.col("yv")))
        | ((F.col("xu") != F.col("xv")) & (F.col("yu") != F.col("yv")))
    ).count()
    return 1.0 - agree / m


def partition_intersection(zeta: DataFrame, eta: DataFrame) -> DataFrame:
    """(id, label) — the product partition, labels densified by the
    (la, lb) cell's minimum member id (canonical under relabeling, like
    the reference's compact())."""
    za = zeta.select("id", F.col("label").alias("la"))
    eb = eta.select("id", F.col("label").alias("lb"))
    both = za.join(eb, "id")
    cells = both.groupBy("la", "lb").agg(F.min("id").alias("cell"))
    return both.join(cells, ["la", "lb"]).select("id", F.col("cell").alias("label"))


def conductance(graph: Graph, labels: DataFrame) -> float:
    """Conductance.cpp:12-43 — for a 2-partition: cut weight divided by
    the smaller side's volume (weighted degrees)."""
    n_subsets = labels.select("label").distinct().count()
    if n_subsets != 2:
        raise ValueError("conductance requires a 2-partition")
    deg = (
        graph.symmetrized_edges()
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("weight").alias("wdeg"))
    )
    vols = (
        labels.join(deg, "id", "left")
        .groupBy("label")
        .agg(F.sum(F.coalesce("wdeg", F.lit(0.0))).alias("vol"))
    )
    denom = vols.agg(F.min("vol")).first()[0]
    return float(edge_cut(graph, labels)) / float(denom)


def sampled_node_structural_rand(
    graph: Graph, zeta: DataFrame, eta: DataFrame,
    max_samples: int = 1000, seed: int = 1,
) -> float:
    """SampledNodeStructuralRandMeasure.cpp:17-52 dissimilarity
    1 − (n11 + n00)/samples over `max_samples` random DISTINCT node
    pairs. The reference rejection-samples ids until it has maxSamples
    valid pairs; the engine draws exactly max_samples distinct pairs by
    hashing ranks with the skip trick (same distribution, one pass,
    SQL-replicable)."""
    from networkit_spark.operators.embedding import _u
    from networkit_spark.plans.ranking import global_row_numbers

    spark = graph.edges.sparkSession
    n = graph.num_vertices()
    ranked = global_row_numbers(graph.vertices(), "id", "rk")
    su = F.floor(_u(F.col("i"), 0, F.lit(0), seed) * n).cast("long")
    qu = F.floor(_u(F.col("i"), 1, F.lit(0), seed) * (n - 1)).cast("long")
    pairs = (
        spark.range(max_samples).select(F.col("id").alias("i"))
        .withColumn("urk", su)
        .withColumn("vrk", F.when(qu >= F.col("urk"), qu + 1).otherwise(qu))
        .join(ranked.select(F.col("id").alias("u"), F.col("rk").alias("urk")), "urk")
        .join(ranked.select(F.col("id").alias("v"), F.col("rk").alias("vrk")), "vrk")
        .select("u", "v")
    )
    lab = lambda df, side, name: df.select(  # noqa: E731
        F.col("id").alias(side), F.col("label").alias(name)
    )
    j = (
        pairs.join(lab(zeta, "u", "zu"), "u").join(lab(zeta, "v", "zv"), "v")
        .join(lab(eta, "u", "eu"), "u").join(lab(eta, "v", "ev"), "v")
    )
    agree = j.select(
        F.sum(
            F.when(
                ((F.col("zu") == F.col("zv")) & (F.col("eu") == F.col("ev")))
                | ((F.col("zu") != F.col("zv")) & (F.col("eu") != F.col("ev"))),
                1,
            ).otherwise(0)
        ).alias("ok")
    ).first()["ok"]
    return 1.0 - float(agree) / float(max_samples)


def sampled_graph_structural_rand(
    graph: Graph, zeta: DataFrame, eta: DataFrame,
    max_samples: int = 1000, seed: int = 1,
) -> float:
    """SampledGraphStructuralRandMeasure.cpp dissimilarity over
    `max_samples` hash-sampled EDGES (connected pairs) — the
    graph-structural restriction of the rand index."""
    from networkit_spark.operators.embedding import _u
    from networkit_spark.plans.ranking import global_ranks_score_desc

    spark = graph.edges.sparkSession
    und = graph.simple_undirected_edges().select("u", "v")
    m = und.count()
    # edges ranked on (u DESC, v) — any total order works; the desc
    # helper takes tie columns, so no composite key is needed
    ranked = global_ranks_score_desc(und, "u", ["v"], "erk")
    pick = (
        spark.range(max_samples).select(F.col("id").alias("i"))
        .withColumn(
            "erk", F.floor(_u(F.col("i"), 2, F.lit(0), seed) * m).cast("long")
        )
        .join(ranked, "erk")
        .select("u", "v")
    )
    lab = lambda df, side, name: df.select(  # noqa: E731
        F.col("id").alias(side), F.col("label").alias(name)
    )
    j = (
        pick.join(lab(zeta, "u", "zu"), "u").join(lab(zeta, "v", "zv"), "v")
        .join(lab(eta, "u", "eu"), "u").join(lab(eta, "v", "ev"), "v")
    )
    agree = j.select(
        F.sum(
            F.when(
                ((F.col("zu") == F.col("zv")) & (F.col("eu") == F.col("ev")))
                | ((F.col("zu") != F.col("zv")) & (F.col("eu") != F.col("ev"))),
                1,
            ).otherwise(0)
        ).alias("ok")
    ).first()["ok"]
    return 1.0 - float(agree) / float(max_samples)
