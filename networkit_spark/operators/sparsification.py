"""Edge-score sparsification: SCAN structural similarity, Jaccard
neighborhood similarity, local-degree score, global threshold filter.

Reference:
- SCANStructuralSimilarityScore.cpp:13-16:
    score(u,v) = (tri(u,v) + 1) / sqrt((deg u + 1)·(deg v + 1))
- JaccardDistance.cpp:38-40 (surfaced as JaccardSimilarityAttributizer /
  JaccardSimilaritySparsifier in the Python layer):
    jaccard(u,v) = tri(u,v) / (deg u + deg v − tri(u,v));  distance = 1 − jaccard
- LocalDegreeScore.cpp:28-84: per node i with degree d, rank its
  neighbors by THEIR degree descending (ties share the competition rank
  — reference's rank+=numSame bookkeeping ≡ SQL rank()); the edge to the
  neighbor at rank r scores e = 1 − log(r)/log(d) (1 when d ≤ 1); an
  edge's final score is the max over its two endpoint views.
- GlobalThresholdFilter.cpp: keep edges with score above (or below) a
  threshold.

All four are single-pass joins/aggregations over the triangle-per-edge
and degree tables — tri(u,v) reuses triangle_edge_scores (the
degree-ordered enumeration, so the heavy lifting is skew-bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.triangles import triangle_edge_scores


def _edge_tri_deg(graph: Graph) -> DataFrame:
    """(u, v, triangles, deg_u, deg_v) per canonical undirected edge."""
    tri = triangle_edge_scores(graph)
    deg = (
        graph.simple_undirected_edges()
        .select(F.col("u").alias("id"))
        .unionByName(graph.simple_undirected_edges().select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    return (
        tri.join(deg.select(F.col("id").alias("u"), F.col("deg").alias("deg_u")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("deg").alias("deg_v")), "v")
    )


def scan_similarity_scores(graph: Graph) -> DataFrame:
    """(u, v, score) — SCAN structural similarity."""
    return _edge_tri_deg(graph).select(
        "u",
        "v",
        (
            (F.col("triangles") + 1)
            / F.sqrt((F.col("deg_u") + 1) * (F.col("deg_v") + 1))
        ).alias("score"),
    )


def jaccard_similarity_scores(graph: Graph) -> DataFrame:
    """(u, v, score) — neighborhood Jaccard coefficient per edge."""
    return _edge_tri_deg(graph).select(
        "u",
        "v",
        (
            F.col("triangles")
            / (F.col("deg_u") + F.col("deg_v") - F.col("triangles"))
        ).alias("score"),
    )


def jaccard_distances(graph: Graph) -> DataFrame:
    """(u, v, distance) = 1 − jaccard (JaccardDistance.cpp:38-40)."""
    return jaccard_similarity_scores(graph).select(
        "u", "v", (1.0 - F.col("score")).alias("distance")
    )


def local_degree_scores(graph: Graph) -> DataFrame:
    """(u, v, score) — LocalDegreeScore.cpp:28-84 (see module docstring)."""
    und = graph.simple_undirected_edges()
    deg = (
        und.select(F.col("u").alias("id"))
        .unionByName(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    # both endpoint views: (node, nbr) with nbr's degree and node's degree
    views = und.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionByName(
        und.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    views = views.join(
        deg.select(F.col("id").alias("node"), F.col("deg").alias("d")), "node"
    ).join(deg.select(F.col("id").alias("nbr"), F.col("deg").alias("nbr_deg")), "nbr")
    w = Window.partitionBy("node").orderBy(F.desc("nbr_deg"))
    scored = views.withColumn("rank", F.rank().over(w)).select(
        "node",
        "nbr",
        F.when(F.col("d") <= 1, 1.0)
        .otherwise(1.0 - F.log(F.col("rank").cast("double")) / F.log(F.col("d").cast("double")))
        .alias("e"),
    )
    per_edge = scored.select(
        F.least("node", "nbr").alias("u"),
        F.greatest("node", "nbr").alias("v"),
        "e",
    )
    return per_edge.groupBy("u", "v").agg(F.max("e").alias("score"))


def global_threshold_filter(
    graph: Graph, scores: DataFrame, threshold: float, above: bool = True
) -> Graph:
    """Sparsified graph keeping edges with score ≥ threshold (above=True)
    or ≤ threshold (GlobalThresholdFilter.cpp semantics)."""
    cond = F.col("score") >= threshold if above else F.col("score") <= threshold
    keep = scores.filter(cond).select("u", "v")
    kept_edges = (
        graph.simple_undirected_edges()
        .join(keep, ["u", "v"], "left_semi")
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    return Graph.from_edges(
        kept_edges, directed=False, vertices=graph.vertices()
    )


def adamic_adar_scores(graph: Graph) -> DataFrame:
    """(u, v, score) with score(u,v) = Σ_{w ∈ N(u)∩N(v)} 1/log(deg w)
    (AdamicAdarDistance.cpp:16-52 accumulates exactly this per edge via
    triangle enumeration). Every edge present; no common neighbors → 0."""
    from networkit_spark.operators.triangles import triangles

    tri = triangles(graph)
    deg = (
        graph.simple_undirected_edges()
        .select(F.col("u").alias("id"))
        .unionByName(graph.simple_undirected_edges().select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    d = {c: deg.select(F.col("id").alias(c), F.col("deg").alias(f"deg_{c}")) for c in "abc"}
    t = tri.join(d["a"], "a").join(d["b"], "b").join(d["c"], "c")
    # triangle {a,b,c} contributes the opposite corner's 1/log(deg)
    contribs = (
        t.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"),
                 (1.0 / F.log(F.col("deg_c").cast("double"))).alias("w"))
        .unionByName(
            t.select(F.least("a", "c").alias("u"), F.greatest("a", "c").alias("v"),
                     (1.0 / F.log(F.col("deg_b").cast("double"))).alias("w")))
        .unionByName(
            t.select(F.least("b", "c").alias("u"), F.greatest("b", "c").alias("v"),
                     (1.0 / F.log(F.col("deg_a").cast("double"))).alias("w")))
    )
    summed = contribs.groupBy("u", "v").agg(F.sum("w").alias("score"))
    return (
        graph.simple_undirected_edges()
        .join(summed, ["u", "v"], "left")
        .select("u", "v", F.coalesce("score", F.lit(0.0)).alias("score"))
    )


def adamic_adar_distances(graph: Graph) -> DataFrame:
    """(u, v, distance) = 1/score (AdamicAdarDistance.cpp:52 — infinity
    when the edge closes no triangle, matching the reference's 1/0)."""
    return adamic_adar_scores(graph).select(
        "u", "v",
        F.when(F.col("score") > 0, 1.0 / F.col("score"))
        .otherwise(F.lit(float("inf")))
        .alias("distance"),
    )


def local_similarity_scores(graph: Graph) -> DataFrame:
    """(u, v, score) — LocalSimilarityScore.cpp:17-72: per endpoint, rank
    neighbors by Jaccard similarity T/(d_u + d_v - T) descending (ties:
    smaller neighbor id first, AttributizedEdge::operator<,
    LocalSimilarityScore.hpp:25-27); the edge's minimum sparsification
    exponent is 1 - log(rank)/log(deg) (1 for degree-1 endpoints), and
    the score is the max over both endpoints."""
    base = _edge_tri_deg(graph).withColumn(
        "sim",
        F.col("triangles")
        / (F.col("deg_u") + F.col("deg_v") - F.col("triangles")),
    )
    views = base.select(
        F.col("u").alias("node"), F.col("v").alias("alter"),
        "sim", F.col("deg_u").alias("d"),
    ).unionByName(base.select(
        F.col("v").alias("node"), F.col("u").alias("alter"),
        "sim", F.col("deg_v").alias("d"),
    ))
    w = Window.partitionBy("node").orderBy(F.desc("sim"), F.asc("alter"))
    scored = views.withColumn("rn", F.row_number().over(w)).select(
        "node", "alter",
        F.when(F.col("d") <= 1, 1.0)
        .otherwise(1.0 - F.log(F.col("rn").cast("double"))
                   / F.log(F.col("d").cast("double"))).alias("e"),
    )
    return (
        scored.select(F.least("node", "alter").alias("u"),
                      F.greatest("node", "alter").alias("v"), "e")
        .groupBy("u", "v").agg(F.max("e").alias("score"))
    )


def multiscale_scores(
    graph: Graph, attribute: DataFrame | None = None
) -> DataFrame:
    """(u, v, score) — MultiscaleScore.cpp:15-67 over the edge weights
    (or, when `attribute` (u, v, attr) on canonical pairs is given, over
    that per-edge attribute — the SimmelianMultiscaleSparsifier feeds
    triangle counts this way, Sparsifiers.cpp:107-123): per endpoint u,
    p = w(e)/Σ_{e'∋u} w(e'), probability 1 - (1-p)^(deg(u)-1); score =
    max over both endpoints."""
    sym = graph.symmetrized_edges().filter(F.col("src") != F.col("dst"))
    if attribute is not None:
        att_sym = attribute.select(
            F.col("u").alias("src"), F.col("v").alias("dst"),
            F.col("attr").cast("double").alias("weight"),
        ).unionByName(attribute.select(
            F.col("v").alias("src"), F.col("u").alias("dst"),
            F.col("attr").cast("double").alias("weight"),
        ))
        sym = sym.select("src", "dst").join(att_sym, ["src", "dst"])
    per_node = sym.groupBy(F.col("src").alias("node")).agg(
        F.sum("weight").alias("s"), F.count("*").alias("d")
    )
    views = (
        sym.select(F.col("src").alias("node"), F.col("dst").alias("nbr"), "weight")
        .join(per_node, "node")
        .select(
            "node", "nbr",
            # s = 0 (possible only for a zero-mass attribute feed) keeps
            # the endpoint's contribution at 0 — the reference's
            # std::max(0.0, NaN) evaluates to 0.0 (MultiscaleScore.cpp:46)
            F.when(
                F.col("s") > 0,
                1.0 - F.pow(1.0 - F.col("weight") / F.col("s"),
                            F.col("d").cast("double") - 1.0),
            ).otherwise(F.lit(0.0)).alias("p"),
        )
    )
    return (
        views.select(F.least("node", "nbr").alias("u"),
                     F.greatest("node", "nbr").alias("v"), "p")
        .groupBy("u", "v").agg(F.max("p").alias("score"))
    )


def chance_corrected_triangle_scores(graph: Graph) -> DataFrame:
    """(u, v, score) — ChanceCorrectedTriangleScore.cpp:16-33:
    T(n-2)/((d_u-1)(d_v-1)) when the edge closes a triangle, 1 for
    pendant edges, else 0."""
    n = graph.num_vertices()
    return _edge_tri_deg(graph).select(
        "u", "v",
        F.when(F.col("triangles") > 0,
               F.col("triangles") * F.lit(float(n - 2))
               / ((F.col("deg_u") - 1.0) * (F.col("deg_v") - 1.0)))
        .when((F.col("deg_u") == 1) | (F.col("deg_v") == 1), 1.0)
        .otherwise(0.0).alias("score"),
    )


def ranked_neighborhood(graph: Graph) -> DataFrame:
    """(ego, alter, rank) — every neighbor of every vertex ranked by the
    per-edge triangle count DESCENDING; ties share the competition rank
    and rank 0 is best. Reference: SimmelianScore::getRankedNeighborhood
    (SimmelianScore.cpp:17-46) — its `currentRank += equals` bookkeeping
    over the sorted alters is exactly SQL RANK()-1, and the tie ORDER
    never affects the rank, so the window needs no tie-break column.

    Scale: the window partitions by ego — per-vertex state only, no
    global ordering anywhere.
    """
    tri = triangle_edge_scores(graph)
    both = tri.select(
        F.col("u").alias("ego"), F.col("v").alias("alter"), "triangles"
    ).unionByName(
        tri.select(F.col("v").alias("ego"), F.col("u").alias("alter"), "triangles")
    )
    w = Window.partitionBy("ego").orderBy(F.col("triangles").desc())
    return both.select("ego", "alter", (F.rank().over(w) - 1).alias("rank"))


def simmelian_overlap_scores(graph: Graph, max_rank: int = 10) -> DataFrame:
    """(u, v, score) — SimmelianOverlapScore.cpp:19-32: the edge score is
    the OVERLAP of the two endpoints' rank-bounded neighborhoods, i.e.
    |{x : x ∈ N(u)\\{v}, x ∈ N(v)\\{u}, rank_u(x) ≤ maxRank,
         rank_v(x) ≤ maxRank}|
    (getOverlap's matchNeighbors erase/insert bookkeeping reduces to this
    set intersection; locked by the testOverlapCounting fixture in
    SimmelianBackboneGTest.cpp:18-59, replicated in pytest).

    Scale: the rank filter bounds each endpoint's candidate list BEFORE
    the join, so per edge the expansion is the (tie-inflated) top-maxRank
    list, not the full neighborhood; two hash joins, no all-pairs.
    """
    rk = ranked_neighborhood(graph).filter(F.col("rank") <= max_rank)
    e = graph.simple_undirected_edges().select("u", "v")
    a = rk.select(F.col("ego").alias("u"), F.col("alter").alias("x"))
    b = rk.select(F.col("ego").alias("v"), F.col("alter").alias("x"))
    ov = (
        e.join(a, "u")
        .filter(F.col("x") != F.col("v"))  # other == alter → skipped
        .join(b, ["v", "x"])  # x == u impossible: no self-loops in rk
        .groupBy("u", "v")
        .agg(F.count("*").alias("c"))
    )
    return e.join(ov, ["u", "v"], "left").select(
        "u", "v", F.coalesce("c", F.lit(0)).cast("double").alias("score")
    )


def simmelian_jaccard_scores(graph: Graph, max_rank: int | None = None) -> DataFrame:
    """(u, v, score) — SimmelianScore's max-Jaccard redundancy
    (SimmelianScore.cpp:48-76): over rank thresholds r = 0..maxRank,
    jaccard(r) = |{x : max(rank_u(x), rank_v(x)) ≤ r}|
               / |{x : min-side rank ≤ r over N(u)∪N(v), x ∉ {u,v}}|
    and the score is max_r jaccard(r) (testOverlapCounting asserts
    max(1/3, 2/5) = 2/5 at maxRank 3). max_rank=None = unbounded (the
    non-parametric Simmelian backbone).

    Scale shape: instead of evaluating every threshold against every
    candidate (quadratic per edge), each candidate emits a union event
    at its min-rank and an intersection event at its max-rank; two
    running sums over a per-edge window give inter(r)/union(r) at every
    threshold in one pass — O(deg_u + deg_v) rows per edge.
    """
    rk = ranked_neighborhood(graph)
    if max_rank is not None:
        rk = rk.filter(F.col("rank") <= max_rank)
    e = graph.simple_undirected_edges().select("u", "v")
    a = (
        e.join(rk.select(F.col("ego").alias("u"), F.col("alter").alias("x"),
                         F.col("rank").alias("ru")), "u")
        .filter(F.col("x") != F.col("v"))
    )
    b = (
        e.join(rk.select(F.col("ego").alias("v"), F.col("alter").alias("x"),
                         F.col("rank").alias("rv")), "v")
        .filter(F.col("x") != F.col("u"))
    )
    pairs = a.join(b, ["u", "v", "x"], "full_outer").select(
        "u", "v",
        F.least("ru", "rv").alias("mn"),  # least() skips NULLs
        F.when(F.col("ru").isNotNull() & F.col("rv").isNotNull(),
               F.greatest("ru", "rv")).alias("mx"),
    )
    events = pairs.select("u", "v", F.col("mn").alias("val"),
                          F.lit(0).alias("di")).unionByName(
        pairs.filter(F.col("mx").isNotNull())
        .select("u", "v", F.col("mx").alias("val"), F.lit(1).alias("di"))
    )
    w = (
        Window.partitionBy("u", "v")
        .orderBy("val", "di")  # union events first at equal threshold
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = events.select(
        "u", "v", "di",
        F.sum(1 - F.col("di")).over(w).alias("cu"),
        F.sum("di").over(w).alias("ci"),
    )
    j = (
        scored.filter(F.col("di") == 1)
        .groupBy("u", "v")
        .agg(F.max(F.col("ci") / F.col("cu")).alias("score"))
    )
    return e.join(j, ["u", "v"], "left").select(
        "u", "v", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def random_edge_scores(graph: Graph, seed: int = 1) -> DataFrame:
    """(u, v, score) — RandomEdgeScore.cpp:15-24: an iid uniform (0,1]
    draw per edge. The reference pulls from the global URNG; the engine
    uses the shared seeded quadratic hash keyed by the canonical
    endpoints, so the scores are a pure function of (graph, seed) and
    the DuckDB twin is exact (same distribution, reproducible runs —
    the reference's own test contract is only scores ∈ [0,1],
    RandomNodeEdgeGTest.cpp:28-39)."""
    from networkit_spark.operators.embedding import WALK_HASH_M
    from networkit_spark.operators.randomization import _mix

    h = _mix(F.col("u"), F.col("v"), F.lit(seed))
    return graph.simple_undirected_edges().select(
        "u", "v",
        ((h + F.lit(1)).cast("double") / F.lit(float(WALK_HASH_M + 1)))
        .alias("score"),
    )


def random_node_edge_scores(
    graph: Graph, rne_ratio: float = 0.5, seed: int = 1
) -> DataFrame:
    """(u, v, score) — RandomNodeEdgeScore.cpp:17-63: edges are removed
    one at a time, each step choosing uniformly at random (probability
    1−rneRatio) or by random-node-then-random-incident-edge (rneRatio);
    the score is the removal rank / m.

    Distributed substitute (the sequential chain is P-complete to
    replay): each edge races two independent exponential clocks at the
    two strategies' pick rates on the INITIAL graph — uniform rate
    (1−r)/m and node-edge rate r·(1/deg_u + 1/deg_v)/n⁺ (n⁺ = nodes
    with positive degree; GraphTools.cpp:115-180 randomEdge non-uniform
    branch) — and the removal order is the order of the min-clock
    times. At rne_ratio = 0 this IS the reference semantics exactly (a
    uniform random removal permutation); for r > 0 the degree drift of
    the shrinking graph is ignored (mean-field, documented). Ranking
    uses the two-phase global row-number plan — no single-partition
    window."""
    from networkit_spark.operators.embedding import WALK_HASH_M
    from networkit_spark.operators.randomization import _mix
    from networkit_spark.plans.ranking import global_row_numbers

    e = graph.simple_undirected_edges().select("u", "v")
    deg = (
        e.select(F.col("u").alias("id"))
        .unionByName(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    m = e.count()
    npos = deg.count()
    r = float(rne_ratio)
    u01 = (
        _mix(F.col("u"), F.col("v"), F.lit(seed + 1)) + F.lit(1)
    ).cast("double") / F.lit(float(WALK_HASH_M + 1))
    keyed = (
        e.join(deg.select(F.col("id").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("deg").alias("dv")), "v")
        .select(
            "u", "v",
            (
                -F.log(u01)
                / (
                    F.lit((1.0 - r) / m)
                    + F.lit(r)
                    * (F.lit(1.0) / F.col("du") + F.lit(1.0) / F.col("dv"))
                    / F.lit(float(npos))
                )
            ).alias("t"),
        )
    )
    ranked = global_row_numbers(keyed, "t", "rk")
    return ranked.select(
        "u", "v", (F.col("rk").cast("double") / F.lit(float(m))).alias("score")
    )


# ------------------------------------------------------- Sparsifiers.cpp
# The reference's convenience wrapper family (Sparsifiers.cpp:21-137):
# each pairs one edge-score pass with GlobalThresholdFilter(above=True).


def _triangle_attribute(graph: Graph) -> DataFrame:
    """(u, v, attr) = per-edge triangle counts (TriangleEdgeScore feed)."""
    return _edge_tri_deg(graph).select(
        "u", "v", F.col("triangles").alias("attr")
    )


def simmelian_sparsifier_non_parametric(
    graph: Graph, threshold: float
) -> Graph:
    """Sparsifiers.cpp:31-47 — prefix-Jaccard over per-edge triangle
    counts, keep score ≥ threshold."""
    from networkit_spark.operators.edgescores import prefix_jaccard_score

    scores = prefix_jaccard_score(graph, _triangle_attribute(graph))
    return global_threshold_filter(graph, scores, threshold, above=True)


def simmelian_sparsifier_parametric(
    graph: Graph, max_rank: int, min_overlap: int
) -> Graph:
    """Sparsifiers.cpp:49-65 — Simmelian overlap at max_rank, keep
    overlap ≥ min_overlap."""
    scores = simmelian_overlap_scores(graph, max_rank=max_rank)
    return global_threshold_filter(
        graph, scores, float(min_overlap), above=True
    )


def multiscale_sparsifier(graph: Graph, alpha: float) -> Graph:
    """Sparsifiers.cpp:67-88 — multiscale backbone over edge weights."""
    return global_threshold_filter(
        graph, multiscale_scores(graph), alpha, above=True
    )


def simmelian_multiscale_sparsifier(graph: Graph, alpha: float) -> Graph:
    """Sparsifiers.cpp:107-123 — multiscale over per-edge TRIANGLE
    counts."""
    scores = multiscale_scores(graph, attribute=_triangle_attribute(graph))
    return global_threshold_filter(graph, scores, alpha, above=True)


def local_similarity_sparsifier(graph: Graph, e: float) -> Graph:
    """Sparsifiers.cpp:90-105 — local-similarity exponent backbone."""
    return global_threshold_filter(
        graph, local_similarity_scores(graph), e, above=True
    )


def random_sparsifier(graph: Graph, ratio: float, seed: int = 1) -> Graph:
    """Sparsifiers.cpp:125-137 — iid random scores, keep score ≥ ratio
    (the reference quirk: `ratio` is the DROPPED fraction in
    expectation, since scores are U(0,1])."""
    return global_threshold_filter(
        graph, random_edge_scores(graph, seed=seed), ratio, above=True
    )
