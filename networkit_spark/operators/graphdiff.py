"""GraphDifference — the edit script between two graphs.

Reference semantics (networkit/cpp/dynamics/GraphDifference.cpp:18-125):
compare G1 and G2 over node ids; emit EDGE_REMOVAL for edges of G1
missing in G2, EDGE_ADDITION for edges of G2 missing in G1,
EDGE_WEIGHT_UPDATE where both have the edge with different weight, plus
NODE_ADDITION / NODE_REMOVAL for vertex-set changes. The edit script
is ordered removals → node events → additions (:115-118) so replaying
it on G1 yields G2.

Spark shape: three anti-joins and one inner join over the canonical
simple-undirected edge tables plus two vertex anti-joins — no
iteration, exact SQL twin."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph

EDGE_REMOVAL = "edge_removal"
EDGE_ADDITION = "edge_addition"
WEIGHT_UPDATE = "edge_weight_update"
NODE_ADDITION = "node_addition"
NODE_REMOVAL = "node_removal"


def _canon(graph: Graph) -> DataFrame:
    sym = graph.symmetrized_edges()
    return (
        sym.select(F.least("src", "dst").alias("u"),
                   F.greatest("src", "dst").alias("v"), "weight")
        .groupBy("u", "v")
        .agg(F.max("weight").alias("w"))
    )


def graph_difference(g1: Graph, g2: Graph) -> DataFrame:
    """Edit script (kind, u, v, w); node events carry v = NULL."""
    e1, e2 = _canon(g1), _canon(g2)
    removals = e1.join(e2.select("u", "v"), ["u", "v"], "left_anti").select(
        F.lit(EDGE_REMOVAL).alias("kind"), "u", "v", F.col("w")
    )
    additions = e2.join(e1.select("u", "v"), ["u", "v"], "left_anti").select(
        F.lit(EDGE_ADDITION).alias("kind"), "u", "v", F.col("w")
    )
    updates = (
        e1.select("u", "v", F.col("w").alias("w1"))
        .join(e2.select("u", "v", F.col("w").alias("w2")), ["u", "v"])
        .filter(F.col("w1") != F.col("w2"))
        .select(F.lit(WEIGHT_UPDATE).alias("kind"), "u", "v",
                F.col("w2").alias("w"))
    )
    v1, v2 = g1.vertices(), g2.vertices()
    node_add = v2.join(v1, "id", "left_anti").select(
        F.lit(NODE_ADDITION).alias("kind"), F.col("id").alias("u"),
        F.lit(None).cast("long").alias("v"), F.lit(None).cast("double").alias("w"),
    )
    node_rem = v1.join(v2, "id", "left_anti").select(
        F.lit(NODE_REMOVAL).alias("kind"), F.col("id").alias("u"),
        F.lit(None).cast("long").alias("v"), F.lit(None).cast("double").alias("w"),
    )
    return (removals.unionByName(node_rem).unionByName(node_add)
            .unionByName(updates).unionByName(additions))


def difference_summary(g1: Graph, g2: Graph) -> DataFrame:
    """One row of edit counts — getNumberOfEdgeAdditions() et al."""
    edits = graph_difference(g1, g2)
    return edits.agg(
        F.count(F.when(F.col("kind") == EDGE_REMOVAL, 1)).alias("edge_removals"),
        F.count(F.when(F.col("kind") == EDGE_ADDITION, 1)).alias("edge_additions"),
        F.count(F.when(F.col("kind") == WEIGHT_UPDATE, 1)).alias("weight_updates"),
        F.count(F.when(F.col("kind") == NODE_REMOVAL, 1)).alias("node_removals"),
        F.count(F.when(F.col("kind") == NODE_ADDITION, 1)).alias("node_additions"),
        F.count("*").cast("long").alias("total_edits"),
    )
