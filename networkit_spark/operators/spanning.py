"""Spanning forests: maximum-weight spanning forest (Borůvka) and the
plain spanning forest.

Reference surface:
- UnionMaximumSpanningForest.cpp / KruskalMSF.cpp: maximum-weight
  spanning forest via sorted-edge union-find — inherently sequential.
- SpanningForest.cpp:15-31: BFS forest per component (any spanning
  forest; the reference test checks edge count / connectivity, not a
  specific tree).

Spark translation: BORŮVKA — the classic parallel MSF. Each round every
component picks its best incident outgoing edge (max weight, ties toward
the lexicographically smallest canonical endpoint pair — deterministic),
picked edges join the forest, touched components contract (hash-min over
the picked component-level edges), repeat. Component count at least
halves per round → O(log n) rounds of join+window+agg; the contraction
loop runs on component-sized data (≪ edges).

Equivalence to the reference: with DISTINCT weights the maximum spanning
forest is unique, so Borůvka here ≡ Kruskal union-find there, edge for
edge (tests/test_spanning.py proves it against a Kruskal oracle); with
ties both return *a* maximum forest of equal total weight — exactly the
guarantee the sequential reference gives (its result depends on sort
order among equal weights)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.storagelevel import StorageLevel

from networkit_spark.graph import Graph
from networkit_spark.plans.iterative import truncate


def maximum_spanning_forest(graph: Graph, max_rounds: int = 64) -> DataFrame:
    """Forest edges (u, v, weight) with u < v; union over components of a
    maximum-weight spanning tree. Undirected semantics (symmetrized
    edges; self-loops never qualify)."""
    spark = graph.edges.sparkSession
    und = (
        graph.simple_undirected_edges()
        .join(
            graph.symmetrized_edges().select(
                F.least("src", "dst").alias("u"),
                F.greatest("src", "dst").alias("v"),
                "weight",
            ),
            ["u", "v"],
        )
        .groupBy("u", "v")
        .agg(F.max("weight").alias("weight"))  # multi-edge: keep best
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    und.count()

    labels = truncate(
        graph.vertices().select("id", F.col("id").alias("comp"))
    )
    forest_pieces: list[DataFrame] = []

    for _ in range(max_rounds):
        lu = labels.select(F.col("id").alias("u"), F.col("comp").alias("cu"))
        lv = labels.select(F.col("id").alias("v"), F.col("comp").alias("cv"))
        el = und.join(lu, "u").join(lv, "v").filter(F.col("cu") != F.col("cv"))
        if el.limit(1).count() == 0:
            break

        # each component's best outgoing edge, from both sides
        sides = el.select(F.col("cu").alias("comp"), "u", "v", "weight", "cu", "cv").unionByName(
            el.select(F.col("cv").alias("comp"), "u", "v", "weight", "cu", "cv")
        )
        w = Window.partitionBy("comp").orderBy(
            F.desc("weight"), F.asc("u"), F.asc("v")
        )
        chosen = (
            sides.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("u", "v", "weight", "cu", "cv")
            .dropDuplicates(["u", "v"])
        )
        chosen = truncate(chosen)
        forest_pieces.append(chosen.select("u", "v", "weight"))

        # contract: exact connected components of the picked
        # component-level edges (reuses the engine's pointer-doubling
        # hash-min — O(log chain) supersteps even when the per-component
        # choices form long chains, e.g. uniform weights on a path)
        from networkit_spark.operators.components import connected_components

        comp_graph = Graph.from_edges(
            chosen.select(F.col("cu").alias("src"), F.col("cv").alias("dst")),
            directed=False,
        )
        mapping = connected_components(comp_graph).labels.select(
            F.col("id").alias("comp"), F.col("label").alias("root")
        )
        labels = truncate(
            labels.join(mapping, "comp", "left").select(
                "id", F.coalesce("root", F.col("comp")).alias("comp")
            ),
            release=labels,
        )

    und.unpersist()
    if not forest_pieces:
        return spark.createDataFrame([], "u long, v long, weight double")
    out = forest_pieces[0]
    for p in forest_pieces[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates(["u", "v"])


def spanning_forest(graph: Graph) -> DataFrame:
    """SpanningForest.cpp:15-31 equivalent: any spanning forest, one tree
    per connected component — Borůvka on unit weights (deterministic
    through the same tie-breaks)."""
    unit = Graph.from_edges(
        graph.symmetrized_edges().select("src", "dst"),
        directed=False,
        already_symmetrized=True,
        vertices=graph.vertices(),
    )
    return maximum_spanning_forest(unit).select("u", "v")
