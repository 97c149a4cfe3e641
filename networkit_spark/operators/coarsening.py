"""ParallelPartitionCoarsening: contract a graph by a partition.

Reference: networkit/cpp/coarsening/ParallelPartitionCoarsening.cpp:22-108.
Semantics reproduced:
- coarse vertex per partition subset, ids compacted to 0..k-1
  (`Partition::compact`, ParallelPartitionCoarsening.cpp:24-25). The
  reference compacts in first-appearance order (nondeterministic under
  OpenMP elsewhere); we compact by ascending label value — canonical and
  deterministic. Parity with the reference is defined up to relabeling,
  exactly how its own tests compare partitions.
- coarse graph is WEIGHTED, UNDIRECTED (`Graph(numParts, true, false)`,
  :34); weight(Cu, Cv) = total fine edge weight between the two subsets;
  weight of the coarse self-loop (Cu, Cu) = total intra-subset fine edge
  weight with each fine undirected edge counted ONCE plus fine self-loops
  once (`sv != su || u >= v` condition, :43).
- also returns the fine→coarse node mapping
  (`getFineToCoarseNodeMapping`, :105).

Invariant used as the main test oracle: modularity(fine graph, partition)
== modularity(coarse graph, singletons) — contraction preserves the
modularity functional, which is why Louvain recursion works.

Spark plan: two broadcast-friendly joins of the symmetrized edge table
against the (small) label table, then one hash aggregation on
(coarse_src, coarse_dst). No iteration; the sym table keeps both arc
directions so the grouped sums land symmetric and the result IS a valid
`already_symmetrized` undirected edge table. At 100 TB the labels side is
vertices-sized — when it exceeds broadcast range the join shuffles on the
same `src` hash-partitioning the edge table already carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph


def compact_labels(labels: DataFrame) -> DataFrame:
    """(label → coarse_id) dictionary: dense 0..k-1 by ascending label
    (canonical form of Partition::compact). Two-phase rank
    (plans/ranking.py) — the label dictionary is vertex-sized on the
    first Louvain level; no single-partition global window."""
    from networkit_spark.plans.ranking import global_row_numbers

    return global_row_numbers(
        labels.select("label").distinct(), "label", "coarse_id"
    )


def coarsen(graph: Graph, labels: DataFrame) -> tuple[Graph, DataFrame]:
    """Contract `graph` by `labels(id, label)`.

    Returns (coarse_graph, mapping) where mapping = (id, coarse_id) for
    every fine vertex. The coarse graph is weighted undirected with
    self-loops carrying the intra-subset weight (see module docstring).
    """
    dictionary = compact_labels(labels)
    mapping = labels.join(dictionary, "label").select("id", "coarse_id")

    sym = graph.symmetrized_edges()
    mu = mapping.select(F.col("id").alias("src"), F.col("coarse_id").alias("cu"))
    mv = mapping.select(F.col("id").alias("dst"), F.col("coarse_id").alias("cv"))
    arcs = sym.join(mu, "src").join(mv, "dst")

    # ONE aggregation for both inter- and intra-subset weights (a
    # union of two filtered branches would recompute the join per
    # branch — Spark does no cross-branch CSE). Intra-subset (cu == cv):
    # each fine undirected edge appears twice in the sym table (half
    # weight each), fine self-loops once (full weight) — reproduces the
    # reference's `sv != su || u >= v` once-per-edge count.
    coarse_edges = arcs.groupBy(
        F.col("cu").alias("src"), F.col("cv").alias("dst")
    ).agg(
        F.sum(
            F.when(F.col("cu") != F.col("cv"), F.col("weight")).otherwise(
                F.when(
                    F.col("src") == F.col("dst"), F.col("weight")
                ).otherwise(F.col("weight") / 2.0)
            )
        ).alias("weight")
    )

    coarse_vertices = dictionary.select(F.col("coarse_id").alias("id"))
    coarse = Graph.from_edges(
        coarse_edges,
        directed=False,
        weighted=True,
        vertices=coarse_vertices,
        already_symmetrized=True,
    )
    return coarse, mapping


def prolong(coarse_labels: DataFrame, mapping: DataFrame) -> DataFrame:
    """Unpack a coarse-graph partition onto the fine graph
    (PLM::prolong, cpp/community/PLM.cpp:305-316): fine label =
    coarse node's label via the fine→coarse mapping."""
    return mapping.join(
        coarse_labels.select(F.col("id").alias("coarse_id"), "label"), "coarse_id"
    ).select("id", "label")
