"""Edge-score module: quadrangle counts, prefix-Jaccard similarity,
geometric-mean normalization, and the score-transform utilities.

Reference (networkit/cpp/edgescores/):
- ChibaNishizekiQuadrangleEdgeScore.cpp:15-95 — per-edge quadrangle
  (4-cycle) counts. Relational identity: a 4-cycle u-v-w-x-u through
  edge {u,v} is one choice of w ∈ N(v)\\{u} and x ∈ (N(u)∩N(w))\\{v},
  so score(u,v) = Σ_{w∈N(v)\\{u}} (|N(u)∩N(w)| − 1) — the −1 removes
  x = v, which is always a common neighbor of u and w.
- PrefixJaccardScore.cpp:20-152 — per edge {u,v}: each endpoint's
  incident edges are COMPETITION-ranked by attribute DESC (ties share
  a rank, computed over the full incidence list including the edge
  itself); walking ranks r = 0, 1, … adds both sides' rank-r neighbors
  (skipping the opposite endpoint) and takes the best Jaccard
  |common| / |union| over all prefixes.
- GeometricMeanScore.cpp:18-41 — a(e)/sqrt(S(u)·S(v)) with S = sum of
  incident attributes; 0 when a(e) ≤ 0.
- TriangleEdgeScore.cpp / ChibaNishizekiTriangleEdgeScore.cpp — per-
  edge triangle counts (= operators/triangles.triangle_edge_scores).
- EdgeScoreNormalizer.cpp:11-40 — linear rescale to [lower, upper],
  optionally inverted.
- EdgeScoreLinearizer.cpp:21-60 — score → rank position / (m − 1)
  (0.5 when m == 1); the reference breaks attribute ties with
  Aux::Random::integer(); the deterministic (u, v) tie-break here is
  the documented substitution.
- EdgeScoreBlender.cpp:17-29 — select ? a1 : a0 per edge.
- EdgeScoreAsWeight.cpp:16-35 — weight = offset + factor·score (or
  ·score², squared=True).

All operators take/return per-edge DataFrames keyed by the canonical
pair (u < v) — the engine's edge id (graphtools.index_edges parity).

Scale: quadrangle is one wedge-count table (the triangle machinery's
shape) + one neighbor join; prefix-Jaccard windows partition by edge,
bounded by the two endpoint degrees — no global windows; the
transforms are single projections (min/max aggregates broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.ranking import global_ranks_score_desc


def _und(graph: Graph) -> DataFrame:
    return (
        graph.edges.select(F.least("src", "dst").alias("u"),
                           F.greatest("src", "dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _sym(graph: Graph) -> DataFrame:
    return graph.symmetrized_edges().select("src", "dst")


def quadrangle_edge_score(graph: Graph) -> DataFrame:
    """(u, v, score) — 4-cycles through each canonical edge."""
    sym = _sym(graph)
    cn = (
        sym.alias("x")
        .join(sym.alias("y"), F.col("x.dst") == F.col("y.src"))
        .filter(F.col("x.src") != F.col("y.dst"))
        .groupBy(F.col("x.src").alias("a"), F.col("y.dst").alias("b"))
        .agg(F.count("*").alias("c"))
    )
    e = _und(graph)
    quads = (
        e.join(sym, (sym.src == e.v) & (sym.dst != e.u))
        .select("u", "v", F.col("dst").alias("w"))
        .join(cn, (F.col("a") == F.col("u")) & (F.col("b") == F.col("w")))
        .groupBy("u", "v")
        .agg(F.sum(F.col("c") - 1).cast("long").alias("score"))
    )
    return e.join(quads, ["u", "v"], "left").select(
        "u", "v", F.coalesce("score", F.lit(0)).cast("long").alias("score")
    )


def prefix_jaccard_score(graph: Graph, attribute: DataFrame) -> DataFrame:
    """(u, v, score) — PrefixJaccardScore over per-edge `attribute`
    (u, v, attr) on canonical pairs. Rank walk realized as cumulative
    counts over the merged per-edge event stream (docstring)."""
    attr_sym = attribute.select(
        F.col("u").alias("a"), F.col("v").alias("w"), F.col("attr")
    ).unionByName(
        attribute.select(F.col("v").alias("a"), F.col("u").alias("w"), "attr")
    )
    # competition rank per endpoint over its FULL incidence list
    wr = Window.partitionBy("a").orderBy(F.col("attr").desc())
    ranked = attr_sym.withColumn("r", F.rank().over(wr) - 1)

    e = _und(graph)
    u_side = (
        e.join(ranked, (ranked.a == e.u) & (ranked.w != e.v))
        .select("u", "v", "w", F.col("r").alias("ru"))
    )
    v_side = (
        e.join(ranked, (ranked.a == e.v) & (ranked.w != e.u))
        .select("u", "v", "w", F.col("r").alias("rv"))
    )
    both = u_side.join(v_side, ["u", "v", "w"], "full") \
        .select("u", "v", "w", "ru", "rv")
    events = both.select(
        "u", "v",
        F.explode(
            F.array_compact(F.array(
                F.when(F.col("ru").isNotNull(),
                       F.struct(F.col("ru").alias("r"),
                                F.lit(1).alias("du"), F.lit(0).alias("dv"),
                                F.lit(0).alias("dc"))),
                F.when(F.col("rv").isNotNull(),
                       F.struct(F.col("rv").alias("r"),
                                F.lit(0).alias("du"), F.lit(1).alias("dv"),
                                F.lit(0).alias("dc"))),
                F.when(F.col("ru").isNotNull() & F.col("rv").isNotNull(),
                       F.struct(F.greatest("ru", "rv").alias("r"),
                                F.lit(0).alias("du"), F.lit(0).alias("dv"),
                                F.lit(1).alias("dc"))),
            ))
        ).alias("ev"),
    ).select("u", "v", "ev.r", "ev.du", "ev.dv", "ev.dc")
    per_rank = events.groupBy("u", "v", "r").agg(
        F.sum("du").alias("du"), F.sum("dv").alias("dv"),
        F.sum("dc").alias("dc"),
    )
    we = Window.partitionBy("u", "v").orderBy("r") \
        .rowsBetween(Window.unboundedPreceding, 0)
    jac = per_rank.select(
        "u", "v",
        (F.sum("dc").over(we)).alias("c"),
        (F.sum("du").over(we) - F.sum("dc").over(we)).alias("uo"),
        (F.sum("dv").over(we) - F.sum("dc").over(we)).alias("vo"),
    ).withColumn(
        "j",
        F.when(F.col("c") + F.col("uo") + F.col("vo") > 0,
               F.col("c") / (F.col("c") + F.col("uo") + F.col("vo")))
        .otherwise(F.lit(0.0)),
    )
    best = jac.groupBy("u", "v").agg(F.max("j").alias("score"))
    return e.join(best, ["u", "v"], "left").select(
        "u", "v", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def geometric_mean_score(graph: Graph, attribute: DataFrame) -> DataFrame:
    """(u, v, score) = attr / sqrt(S(u)·S(v)); 0 when attr ≤ 0."""
    attr_sym = attribute.select(
        F.col("u").alias("a"), F.col("attr")
    ).unionByName(attribute.select(F.col("v").alias("a"), "attr"))
    sums = attr_sym.groupBy("a").agg(F.sum("attr").alias("s"))
    return (
        attribute
        .join(sums.select(F.col("a").alias("u"), F.col("s").alias("su")), "u")
        .join(sums.select(F.col("a").alias("v"), F.col("s").alias("sv")), "v")
        .select(
            "u", "v",
            F.when(F.col("attr") > 0,
                   F.col("attr") / F.sqrt(F.col("su") * F.col("sv")))
            .otherwise(F.lit(0.0)).alias("score"),
        )
    )


def edge_score_normalizer(
    scores: DataFrame, lower: float = 0.0, upper: float = 1.0,
    invert: bool = False,
) -> DataFrame:
    ext = scores.agg(F.min("score").alias("lo"), F.max("score").alias("hi")) \
        .first()
    lo, hi = float(ext["lo"]), float(ext["hi"])
    factor = (upper - lower) / (hi - lo)
    offset = lower - lo * factor
    if invert:
        factor = -factor
        offset = upper - lo * factor
    return scores.select(
        "u", "v", (F.col("score") * F.lit(factor) + F.lit(offset)).alias("score")
    )


def edge_score_linearizer(scores: DataFrame, inverse: bool = False) -> DataFrame:
    """Rank position / (m−1) in score order (DESC when inverse);
    deterministic (u, v) tie-break — documented substitution for the
    reference's random tie shuffle."""
    m = scores.count()
    if m == 1:
        return scores.select("u", "v", F.lit(0.5).alias("score"))
    key = F.col("score") if inverse else -F.col("score")
    ranked = global_ranks_score_desc(
        scores.withColumn("_k", key.cast("double")), "_k", ["u", "v"],
        out_col="pos",
    )
    return ranked.select(
        "u", "v", (F.col("pos") / F.lit(float(m - 1))).alias("score")
    )


def edge_score_blender(
    selection: DataFrame, score0: DataFrame, score1: DataFrame
) -> DataFrame:
    """selection (u, v, sel BOOLEAN) picks score1 else score0."""
    return (
        selection
        .join(score0.select("u", "v", F.col("score").alias("s0")), ["u", "v"])
        .join(score1.select("u", "v", F.col("score").alias("s1")), ["u", "v"])
        .select("u", "v",
                F.when(F.col("sel"), F.col("s1")).otherwise(F.col("s0"))
                .alias("score"))
    )


def edge_score_as_weight(
    graph: Graph, scores: DataFrame, squared: bool = False,
    offset: float = 1.0, factor: float = 1.0,
) -> Graph:
    s = F.col("score") * F.col("score") if squared else F.col("score")
    w = scores.select("u", "v", (F.lit(offset) + F.lit(factor) * s).alias("weight"))
    e = graph.edges.select(
        "src", "dst",
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"),
    ).join(w, ["u", "v"]).select("src", "dst", "weight")
    return Graph.from_edges(
        e, directed=graph.directed, weighted=True,
        vertices=graph.vertices(), already_symmetrized=not graph.directed,
    )
