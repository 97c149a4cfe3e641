"""Parquet table sources for the driver-testdata star schema.

The driver generates TPC-H-ish parquet tables under /root/testdata/sf*/
(TESTDATA.md). The engine's canonical *derived link graph* maps lineitem
order→part relationships onto a bounded id space — a deterministic,
engine-agnostic rule that DuckDB can replicate exactly (the correctness
oracle in __spark_entry__.py), standing in for the Common-Crawl
pages→edges derivation (BASELINE.json input_hint) which is exercised by
networkit_spark.sources.pages on synthesized pages corpora.

Scale note: the derivation is a pure projection + modulo — predicate
pushdown and column pruning reach the parquet scan (only l_orderkey,
l_partkey are read), and the dropDuplicates is one hash shuffle on
(src, dst), the same shape as deduping a web link table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

# Fixed id-space modulus for the derived graph; the SQL oracles embed the
# same literal, so changing it is a breaking change to __spark_entry__.py.
GRAPH_MODULUS = 601

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def derive_web_edges(
    spark: SparkSession, sf_dir: str, modulus: int = GRAPH_MODULUS
) -> DataFrame:
    """Directed simple edge table (src, dst, weight=1.0), no self-loops.

    src = l_orderkey % modulus, dst = l_partkey % modulus, deduped.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            (F.col("l_orderkey") % modulus).alias("src"),
            (F.col("l_partkey") % modulus).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .withColumn("weight", F.lit(1.0))
    )


# Shared SQL prelude defining the identical derivation for the DuckDB
# oracle (tables are pre-registered as views by the driver).
EDGES_CTE = f"""
edges AS (
  SELECT DISTINCT (l_orderkey % {GRAPH_MODULUS}) AS src,
                  (l_partkey % {GRAPH_MODULUS}) AS dst,
                  1.0 AS weight
  FROM lineitem
  WHERE (l_orderkey % {GRAPH_MODULUS}) <> (l_partkey % {GRAPH_MODULUS})
),
v AS (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM edges UNION ALL SELECT dst AS id FROM edges
  )
),
und AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM edges
),
sym AS (
  SELECT u AS src, v AS dst, 1.0 AS weight FROM und
  UNION ALL
  SELECT v AS src, u AS dst, 1.0 AS weight FROM und
)
""".strip()
