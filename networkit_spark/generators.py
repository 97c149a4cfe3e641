"""Seeded distributed graph generators — Spark-native fixtures & bench
inputs (reference: networkit/cpp/generators/*, SURVEY.md §2.8).

All generators are pure column expressions over spark.range(...): no
driver-side loops, no Python UDFs, fully deterministic given (seed) —
the properties a 100 TB bench harness needs (any executor can regenerate
its partition independently; no shuffle until the caller asks for one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _h(seed: int, *cols) -> F.Column:
    """Deterministic uniform 64-bit hash of (seed, *cols), non-negative."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def erdos_renyi(spark: SparkSession, n: int, p: float, seed: int = 42,
                directed: bool = False) -> DataFrame:
    """G(n, p) via hash-thresholding every candidate pair — O(n²) candidate
    scan, embarrassingly parallel, no RNG state. Use for n ≤ ~10⁴ (tests);
    for bench-scale graphs use rmat() which is O(m)."""
    pairs = (
        spark.range(n * n)
        .select(
            (F.col("id") / n).cast("long").alias("src"),
            (F.col("id") % n).alias("dst"),
        )
    )
    pairs = pairs.filter(
        F.col("src") < F.col("dst") if not directed else F.col("src") != F.col("dst")
    )
    scale = 1_000_000_000
    return (
        pairs.filter((_h(seed, "src", "dst") % scale) < int(p * scale))
        .withColumn("weight", F.lit(1.0))
    )


def rmat(spark: SparkSession, scale: int, edge_factor: int = 16, seed: int = 42,
         a: float = 0.57, b: float = 0.19, c: float = 0.19) -> DataFrame:
    """R-MAT power-law generator (Chakrabarti et al., SDM'04): n = 2^scale
    nodes, m = n·edge_factor directed edges. Per edge and per bit level,
    the quadrant is chosen by an independent hash draw — O(m) work, zero
    shuffle, partition-local regeneration.

    Returns (src, dst, weight) with multi-edges retained (dedup is the
    caller's choice, as in the reference's checkMultiEdge)."""
    n = 1 << scale
    m = n * edge_factor
    ab, abc = a + b, a + b + c
    scale_i = 1_000_000_000
    t_a, t_ab, t_abc = int(a * scale_i), int(ab * scale_i), int(abc * scale_i)

    df = spark.range(m)
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for level in range(scale):
        draw = _h(seed + level, "id") % scale_i
        src_bit = F.when(draw < t_ab, F.lit(0)).otherwise(F.lit(1))
        dst_bit = (
            F.when(draw < t_a, F.lit(0))
            .when(draw < t_ab, F.lit(1))
            .when(draw < t_abc, F.lit(0))
            .otherwise(F.lit(1))
        )
        src = src * 2 + src_bit
        dst = dst * 2 + dst_bit
    return df.select(
        src.cast("long").alias("src"),
        dst.cast("long").alias("dst"),
        F.lit(1.0).alias("weight"),
    )


def planted_partition(spark: SparkSession, n: int, k: int, p_intra: float,
                      p_inter: float, seed: int = 42) -> DataFrame:
    """ClusteredRandomGraphGenerator semantics
    (ClusteredRandomGraphGenerator.cpp:24-50): node v belongs to cluster
    v % k; pair (u,v) gets an edge with p_intra if same cluster else
    p_inter. Degenerate (1.0, 0.0) → k disjoint cliques (the PLP planted
    fixture)."""
    pairs = (
        spark.range(n * n)
        .select(
            (F.col("id") / n).cast("long").alias("src"),
            (F.col("id") % n).alias("dst"),
        )
        .filter(F.col("src") < F.col("dst"))
    )
    scale = 1_000_000_000
    same = (F.col("src") % k) == (F.col("dst") % k)
    thresh = F.when(same, F.lit(int(p_intra * scale))).otherwise(
        F.lit(int(p_inter * scale))
    )
    return (
        pairs.filter((_h(seed, "src", "dst") % scale) < thresh)
        .withColumn("weight", F.lit(1.0))
    )
