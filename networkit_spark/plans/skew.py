"""Degree-skew handling: high-degree vertex splitting (salting).

Web graphs are power-law: a hub vertex's adjacency is a single giant
partition under hash-partitioning by src, and one straggler task decides
superstep latency (the reference handles the same skew with OpenMP guided
scheduling — Graph.hpp:1875-1877; Spark's unit of stealing is the
partition, so we must split the data, not the schedule).

split_high_degree() splits each hub's edge rows across `salts` salt
buckets; replicate_for_salt() replicates the (small) per-vertex state for
hub ids so the gather join key becomes (id, salt). Aggregations then run
per (dst) exactly as before — partial aggregation recombines the split
automatically. AQE's skew-join splitting does the same thing at runtime
for joins; explicit salting also covers the aggregation input and keeps
the partitioning stable across supersteps (AQE re-plans each job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hub_ids(edges: DataFrame, threshold: int) -> DataFrame:
    """(id,) vertices whose out-degree exceeds threshold."""
    return (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("d"))
        .filter(F.col("d") > threshold)
        .select("id")
    )


def split_high_degree(edges: DataFrame, threshold: int, salts: int) -> DataFrame:
    """edges + (salt) column: hub rows get salt = hash(dst) % salts, others 0.

    Downstream joins use [src, salt] as the key; partition sizes are
    bounded by max(threshold, hub_degree / salts)."""
    hubs = hub_ids(edges, threshold).withColumn("is_hub", F.lit(True))
    return (
        edges.join(hubs.withColumnRenamed("id", "src"), "src", "left")
        .select(
            "*",
            F.when(
                F.col("is_hub"), F.pmod(F.xxhash64("dst"), F.lit(salts))
            )
            .otherwise(F.lit(0))
            .cast("int")
            .alias("salt"),
        )
        .drop("is_hub")
    )


def replicate_for_salt(state: DataFrame, edges: DataFrame, threshold: int,
                       salts: int, key: str = "id") -> DataFrame:
    """Replicate hub rows of a per-vertex state table across all salt
    values (non-hubs keep a single salt=0 row) so
    state ⋈ salted_edges on [key, salt] is balanced."""
    hubs = hub_ids(edges, threshold)
    hub_state = state.join(hubs, state[key] == hubs.id, "left_semi")
    rest = state.join(hubs, state[key] == hubs.id, "left_anti").withColumn(
        "salt", F.lit(0).cast("int")
    )
    replicated = hub_state.crossJoin(
        F.broadcast(
            state.sparkSession.range(salts).select(F.col("id").cast("int").alias("salt"))
        )
    )
    return rest.unionByName(replicated)
