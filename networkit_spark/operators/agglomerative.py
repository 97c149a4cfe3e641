"""ParallelAgglomerativeClusterer — score / match / contract, iterated.

Reference semantics (networkit/cpp/community/
ParallelAgglomerativeClusterer.cpp:20-84): repeat

  1. score every edge by the modularity gain of merging its endpoints
     (ModularityScoring.hpp:63-71):
         score(u,v) = w(u,v)/W - (deg_u / 2W) * (deg_v / 2W)
  2. compute a heavy matching on those scores (reference:
     PathGrowingMatcher, a 1/2-approximation; here: the engine's
     LocalMax matcher, operators/matching.py — the same 1/2-approx
     guarantee, deterministic),
  3. contract matched pairs (MatchingCoarsening ≡ operators/coarsening)

until the contraction shrinks the graph by less than REL_REPEAT_THRSH
(5e-3) of its nodes or fewer than MIN_NUM_COMMUNITIES remain; the
coarsest vertices are the communities, projected back to the finest
graph (ClusteringProjector ≡ chained prolong()).

Spark shape per level: one degree aggregation + one scored-edge
projection (pure expressions), the LocalMax matching rounds, and the
coarsening contraction — all existing, plan-audited operators. Level
count is O(log n) since matchings halve the graph.

PathGrowingMatcher vs LocalMax is a documented substitute (both are
deterministic ½-approximation heavy matchings); the algorithm's output
contract — a proper partition whose quality pytest checks on planted
graphs — is what the driver query verifies (side-channel property
oracle, like plm_labels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from networkit_spark.graph import Graph
from networkit_spark.operators.coarsening import coarsen, prolong
from networkit_spark.operators.matching import local_max_matching
from networkit_spark.plans.iterative import truncate

MIN_NUM_COMMUNITIES = 2
REL_REPEAT_THRSH = 5e-3


def _modularity_scored(graph: Graph) -> DataFrame:
    """(src, dst, weight=Δmod) over the simple undirected edges."""
    sym = graph.symmetrized_edges()
    wdeg = (
        sym.groupBy(F.col("src").alias("id"))
        .agg(F.sum("weight").alias("wdeg"))
    )
    w_total = graph.total_edge_weight()
    und = (
        graph.simple_undirected_edges()
        .join(
            sym.select(F.least("src", "dst").alias("u"),
                       F.greatest("src", "dst").alias("v"), "weight"),
            ["u", "v"],
        )
        .groupBy("u", "v")
        .agg(F.max("weight").alias("w"))
    )
    return (
        und.join(wdeg.select(F.col("id").alias("u"), F.col("wdeg").alias("du")), "u")
        .join(wdeg.select(F.col("id").alias("v"), F.col("wdeg").alias("dv")), "v")
        .select(
            F.col("u").alias("src"),
            F.col("v").alias("dst"),
            (F.col("w") / w_total
             - (F.col("du") / (2.0 * w_total)) * (F.col("dv") / (2.0 * w_total))
             ).alias("weight"),
        )
    )


def parallel_agglomerative(graph: Graph, max_levels: int = 64) -> DataFrame:
    """(id, label) partition of the fine graph; labels are the coarsest
    graph's compact vertex ids."""
    if graph.directed:
        raise ValueError("agglomerative clustering expects an undirected graph")
    spark = graph.edges.sparkSession

    cur = graph
    mappings: list[DataFrame] = []
    n = cur.num_vertices()
    for _ in range(max_levels):
        if cur.num_edges() == 0:
            break
        scored = Graph.from_edges(
            _modularity_scored(cur), directed=False, weighted=True,
            vertices=cur.vertices(),
        )
        matching = local_max_matching(scored)
        labels = (
            cur.vertices()
            .join(
                matching.select(F.col("u").alias("id"), F.col("u").alias("lu"))
                .unionByName(
                    matching.select(F.col("v").alias("id"), F.col("u").alias("lu"))
                ),
                "id", "left",
            )
            .select("id", F.coalesce("lu", F.col("id")).alias("label"))
        )
        coarse, mapping = coarsen(cur, labels)
        cn = coarse.num_vertices()
        diff = n - cn
        if not (diff > 0 and cn >= MIN_NUM_COMMUNITIES
                and diff / n > REL_REPEAT_THRSH):
            break
        mappings.append(truncate(mapping))
        # lineage cut per level: without it every level's plan embeds all
        # previous levels' matching/coarsening windows and Catalyst
        # compile time blows up (measured 147s on a 2-node level-3 graph)
        cur = Graph.from_edges(
            truncate(coarse.edges), directed=False, weighted=True,
            vertices=truncate(coarse.vertices()), already_symmetrized=True,
        )
        n = cn

    out = cur.vertices().select("id", F.col("id").alias("label"))
    for mapping in reversed(mappings):
        out = prolong(
            out.select(F.col("id"), "label"), mapping
        )
    return truncate(out.select("id", F.col("label").cast("long").alias("label")))
