"""Link prediction: candidate generation + neighborhood indices.

Reference: networkit/cpp/linkprediction/ —
- MissingLinksFinder.cpp:18-75: candidate pairs u<v at EXACT hop
  distance k (BFS layers from every node, pairs first reached at hop k);
- CommonNeighborsIndex.hpp:29-31, JaccardIndex, AdamicAdarIndex,
  ResourceAllocationIndex.cpp:13-21, PreferentialAttachmentIndex: the
  classic neighborhood scores over a node pair.

Spark shape:
- k=2 (THE link-prediction candidate set): one wedge self-join on the
  symmetrized edge table + left-anti against existing edges — no BFS,
  no per-source state; this is the 100 TB path (the wedge join is the
  same bounded plan as triangle counting).
- k>2: reuses the batched multi-source BFS (distance-module plan) and
  filters dist == k — exact parity with findAtDistance for any k, cost
  O(n·m) like the reference's loop over sources.
- all five indices come out of ONE aggregation over the common-neighbor
  wedge (plus a broadcast-degree join): no per-index passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph


def missing_links(graph: Graph, k: int = 2) -> DataFrame:
    """(u, v) — node pairs u < v at exact distance k (no edge between
    them for k >= 2 by definition). MissingLinksFinder.findAtDistance
    parity."""
    if k < 1:
        raise ValueError("k must be >= 1")
    sym = graph.symmetrized_edges().select("src", "dst")
    und = sym.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    if k == 1:
        return und
    if k == 2:
        a = sym.select(F.col("src").alias("u"), F.col("dst").alias("w"))
        b = sym.select(F.col("src").alias("w"), F.col("dst").alias("v"))
        cand = (
            a.join(b, "w")
            .filter(F.col("u") < F.col("v"))
            .select("u", "v")
            .distinct()
        )
        return cand.join(und, ["u", "v"], "left_anti")
    from networkit_spark.operators.distances import multi_source_bfs

    dists = multi_source_bfs(graph, graph.vertices().select(F.col("id").alias("s")))
    return dists.filter(
        (F.col("dist") == k) & (F.col("s") < F.col("id"))
    ).select(F.col("s").alias("u"), F.col("id").alias("v"))


def link_prediction_scores(graph: Graph, pairs: DataFrame) -> DataFrame:
    """(u, v, common_neighbors, jaccard, adamic_adar,
    resource_allocation, pref_attachment) for each candidate pair.

    One wedge aggregation computes every common-neighbor statistic
    (CN = count, AA = Σ 1/ln deg w, RA = Σ 1/deg w); Jaccard and
    preferential attachment need only the endpoint degrees
    (|Γu ∪ Γv| = deg u + deg v − CN on simple graphs). Pairs with no
    common neighbor score 0 like the reference (empty intersection)."""
    sym = graph.symmetrized_edges().select("src", "dst")
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("double").alias("deg")
    )
    nu = sym.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    nv = sym.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    common = (
        pairs.join(nu, "u")
        .join(nv, ["v", "w"])
        .join(deg.select(F.col("id").alias("w"), F.col("deg").alias("dw")), "w")
        .groupBy("u", "v")
        .agg(
            F.count("*").cast("long").alias("common_neighbors"),
            F.sum(1.0 / F.log("dw")).alias("adamic_adar"),
            F.sum(1.0 / F.col("dw")).alias("resource_allocation"),
        )
    )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    return (
        pairs.join(common, ["u", "v"], "left")
        .join(du, "u", "left")
        .join(dv, "v", "left")
        .select(
            "u",
            "v",
            F.coalesce("common_neighbors", F.lit(0)).alias("common_neighbors"),
            F.when(
                F.coalesce("du", F.lit(0.0)) + F.coalesce("dv", F.lit(0.0))
                - F.coalesce("common_neighbors", F.lit(0)) > 0,
                F.coalesce("common_neighbors", F.lit(0))
                / (
                    F.coalesce("du", F.lit(0.0))
                    + F.coalesce("dv", F.lit(0.0))
                    - F.coalesce("common_neighbors", F.lit(0))
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("jaccard"),
            F.coalesce("adamic_adar", F.lit(0.0)).alias("adamic_adar"),
            F.coalesce("resource_allocation", F.lit(0.0)).alias(
                "resource_allocation"
            ),
            (F.coalesce("du", F.lit(0.0)) * F.coalesce("dv", F.lit(0.0))).alias(
                "pref_attachment"
            ),
        )
    )


def extended_link_prediction_scores(
    graph: Graph, pairs: DataFrame, partition: DataFrame | None = None
) -> DataFrame:
    """(u, v, adjusted_rand, neighborhood_distance, total_neighbors,
    neighbors_measure, u_degree, v_degree[, same_community]) — the
    remaining reference LinkPredictor family in ONE pass:

    - AdjustedRandIndex.cpp:14-43 — NOTE the reference computes BOTH
      set differences with std::set_union (its b and c both equal
      |Γu ∪ Γv|); this engine reproduces that behavior exactly, quirk
      and all, like the assortativity m-quirk.
    - NeighborhoodDistanceIndex.hpp: cn / sqrt(deg u · deg v).
    - TotalNeighborsIndex.hpp: |Γu ∪ Γv| = deg u + deg v − cn.
    - NeighborsMeasureIndex.hpp: cn + #{(a, b) ∈ Γu × Γv : a ~ b}
      (ordered pairs; the a == b branch is the common-neighbor count,
      the hasEdge branch is a per-pair fan-out join bounded by
      deg u · deg v — the reference's nested loop is the same work).
    - UDegreeIndex / VDegreeIndex: endpoint degrees.
    - SameCommunityIndex.cpp:28-30: indicator from a caller-supplied
      partition (id, label) — the reference runs PLM internally; any
      partition DataFrame works here (decoupled for determinism).
    """
    sym = graph.symmetrized_edges().select("src", "dst")
    n = graph.num_vertices()
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("double").alias("deg")
    )
    nu = sym.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    nv = sym.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    cn = (
        pairs.join(nu, "u")
        .join(nv, ["v", "w"])
        .groupBy("u", "v")
        .agg(F.count("*").cast("double").alias("cn"))
    )
    # neighbor-connection count: ordered (a, b) in N(u) x N(v) with a ~ b
    adj = sym.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    nm = (
        pairs.join(nu.withColumnRenamed("w", "a"), "u")
        .join(nv.withColumnRenamed("w", "b"), "v")
        .join(adj.withColumn("e", F.lit(1)), ["a", "b"], "left_semi")
        .groupBy("u", "v")
        .agg(F.count("*").cast("double").alias("conn"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    out = (
        pairs.join(cn, ["u", "v"], "left")
        .join(nm, ["u", "v"], "left")
        .join(du, "u", "left")
        .join(dv, "v", "left")
        .select(
            "u",
            "v",
            F.coalesce("cn", F.lit(0.0)).alias("a"),
            F.coalesce("du", F.lit(0.0)).alias("du"),
            F.coalesce("dv", F.lit(0.0)).alias("dv"),
            F.coalesce("conn", F.lit(0.0)).alias("conn"),
        )
        .withColumn("uni", F.col("du") + F.col("dv") - F.col("a"))
        .withColumn("d", F.lit(float(n)) - F.col("uni"))
    )
    # reference quirk: b == c == |union|
    b = F.col("uni")
    c = F.col("uni")
    a = F.col("a")
    d = F.col("d")
    denom = a * b + a * c + 2 * a * d + b * b + b * d + c * c + c * d
    out = out.select(
        "u",
        "v",
        F.when(denom == 0, F.lit(0.0))
        .otherwise((2 * (a * d - b * c)) / denom)
        .alias("adjusted_rand"),
        F.when(
            F.col("du") * F.col("dv") > 0,
            F.col("a") / F.sqrt(F.col("du") * F.col("dv")),
        )
        .otherwise(F.lit(0.0))
        .alias("neighborhood_distance"),
        F.col("uni").alias("total_neighbors"),
        (F.col("a") + F.col("conn")).alias("neighbors_measure"),
        F.col("du").alias("u_degree"),
        F.col("dv").alias("v_degree"),
    )
    if partition is not None:
        pu = partition.select(F.col("id").alias("u"), F.col("label").alias("lu"))
        pv = partition.select(F.col("id").alias("v"), F.col("label").alias("lv"))
        out = (
            out.join(pu, "u", "left")
            .join(pv, "v", "left")
            .select(
                *[cname for cname in out.columns],
                F.when(F.col("lu") == F.col("lv"), F.lit(1.0))
                .otherwise(F.lit(0.0))
                .alias("same_community"),
            )
        )
    return out


def katz_index_scores(
    graph: Graph,
    pairs: DataFrame,
    max_path_length: int = 5,
    damping: float = 0.005,
) -> DataFrame:
    """(u, v, score) — KatzIndex.cpp:34-87: score = Σ_{l=1..L}
    damping^l · walks_l(start, end), where start is the SMALLER-degree
    endpoint (ties → u, :42) — walk counts, not path counts (the
    reference re-adds every hit node to the frontier).

    Spark shape: all distinct start nodes expand together — one walk
    table (s, id, cnt) advanced L times by the adjacency join (the
    batched multi-source BFS plan with counts), then one join back to
    the pair table per endpoint orientation. Counts are exact in double
    up to 2^53 (the reference uses count = uint64)."""
    sym = graph.symmetrized_edges().select("src", "dst")
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    oriented = (
        pairs.join(du, "u", "left")
        .join(dv, "v", "left")
        .select(
            "u",
            "v",
            F.when(
                F.coalesce("du", F.lit(0)) > F.coalesce("dv", F.lit(0)),
                F.col("v"),
            )
            .otherwise(F.col("u"))
            .alias("s"),
        )
    )
    starts = oriented.select("s").distinct()
    walk = starts.select("s", F.col("s").alias("id"), F.lit(1.0).alias("cnt"))
    total = None
    for _l in range(1, max_path_length + 1):
        walk = (
            walk.join(sym, walk.id == sym.src)
            .groupBy("s", F.col("dst").alias("id"))
            .agg(F.sum("cnt").alias("cnt"))
        )
        contrib = walk.select(
            "s", "id", (F.lit(float(damping) ** _l) * F.col("cnt")).alias("sc")
        )
        total = contrib if total is None else total.unionByName(contrib)
    scores = total.groupBy("s", "id").agg(F.sum("sc").alias("score"))
    end_col = F.when(F.col("s") == F.col("u"), F.col("v")).otherwise(F.col("u"))
    return (
        oriented.withColumn("e", end_col)
        .join(
            scores.select("s", F.col("id").alias("e"), "score"),
            ["s", "e"],
            "left",
        )
        .select("u", "v", F.coalesce("score", F.lit(0.0)).alias("score"))
    )


def algebraic_distance_index_scores(
    graph: Graph,
    pairs: DataFrame,
    num_systems: int = 10,
    num_iters: int = 30,
    omega: float = 0.5,
    norm: int = 2,
    seed: int = 1,
) -> DataFrame:
    """(u, v, score) — AlgebraicDistanceIndex.cpp:24-74: raw smoothed
    loads (NO per-system normalization, unlike the community-module
    AlgebraicDistance), then the max norm (norm=0) or p-norm over
    systems of |load_u − load_v|. NaN → 0 per the reference guard."""
    from networkit_spark.operators.distances import algebraic_distance_loads

    loads = algebraic_distance_loads(
        graph,
        num_systems=num_systems,
        num_iters=num_iters,
        omega=omega,
        seed=seed,
        normalize=False,
    )
    lu = loads.select(F.col("id").alias("u"), "sys", F.col("load").alias("xu"))
    lv = loads.select(F.col("id").alias("v"), "sys", F.col("load").alias("xv"))
    joined = pairs.join(lu, "u").join(lv, ["v", "sys"])
    diff = F.abs(F.col("xu") - F.col("xv"))
    if norm == 0:
        agg = joined.groupBy("u", "v").agg(F.max(diff).alias("score"))
    else:
        agg = joined.groupBy("u", "v").agg(
            F.pow(F.sum(F.pow(diff, float(norm))), 1.0 / norm).alias("score")
        )
    return pairs.join(agg, ["u", "v"], "left").select(
        "u", "v", F.coalesce("score", F.lit(0.0)).alias("score")
    )
