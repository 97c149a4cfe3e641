"""Similarity search over an embedding column (array<float>).

- brute_force_topk: exact cosine top-k — the correctness baseline. Dot
  products via F.zip_with + F.aggregate (JVM-side fold, no Python).
- lsh_buckets / lsh_topk: random-hyperplane LSH — the scale path. The
  hyperplanes are DETERMINISTIC integer-weight vectors (w(p,d) =
  ((1 + 31p + 17d) mod 7) - 3) so the DuckDB oracle reproduces the exact
  bucket assignment; on a real deployment swap in seeded Gaussian planes —
  the plan shape (projection → sign-string bucket → per-bucket join) is
  identical.

Scale design: brute force is O(Q×N) — fine for a broadcast-able query set
(the query side is broadcast below the join threshold), wrong for N×N;
LSH bounds the join to per-bucket blocks, and the bucket column is the
shuffle key (power-of-two bucket count keeps partitions balanced; skewed
buckets fall to AQE skew-join splitting). An IVF variant would replace
the sign-string with a k-means cell id — same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

N_PLANES = 8


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return emb.withColumn("_norm", F.sqrt(_dot(v, v)))


def cosine_pairs(queries: DataFrame, corpus: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(query_id, neighbor_id, sim) for all query×corpus pairs (q != n)."""
    q = with_norm(queries, vec_col).select(
        F.col("vec_id").alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
        F.col("_norm").alias("qn"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col("vec_id").alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
        F.col("_norm").alias("cn"),
    )
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("sim"),
        )
    )


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                     vec_col: str = "embedding") -> DataFrame:
    """(query_id, neighbor_id, sim) — exact cosine top-k per query,
    deterministic tie-break by neighbor_id; sim rounded 4."""
    sims = cosine_pairs(queries, corpus, vec_col)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


def hyperplane_weights(n_planes: int = N_PLANES, dims: int = 64) -> list[list[float]]:
    """Deterministic integer hyperplanes (reproducible in ANSI SQL)."""
    return [
        [float(((1 + 31 * p + 17 * d) % 7) - 3) for d in range(dims)]
        for p in range(n_planes)
    ]


def lsh_buckets(emb: DataFrame, n_planes: int = N_PLANES, dims: int = 64,
                vec_col: str = "embedding") -> DataFrame:
    """(vec_id, bucket) — bucket = sign-bit string of the plane projections."""
    planes = hyperplane_weights(n_planes, dims)
    v = _as_double(F.col(vec_col))
    bits = [
        F.when(_dot(v, F.array(*[F.lit(w) for w in plane])) > 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for plane in planes
    ]
    return emb.select("vec_id", F.concat(*bits).alias("bucket"))


def lsh_topk(emb: DataFrame, k: int = 5, n_planes: int = N_PLANES, dims: int = 64,
             vec_col: str = "embedding") -> DataFrame:
    """Approximate all-pairs top-k: exact cosine within each LSH bucket.

    One shuffle on bucket; per-bucket self-join (block-local N_b²) instead
    of the global N². Recall is tunable via n_planes (fewer planes → bigger
    buckets → higher recall/cost)."""
    b = lsh_buckets(emb, n_planes, dims, vec_col)
    e = with_norm(emb, vec_col).join(b, "vec_id")
    left = e.select(
        F.col("vec_id").alias("query_id"),
        F.col("bucket"),
        _as_double(F.col(vec_col)).alias("qv"),
        F.col("_norm").alias("qn"),
    )
    right = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("bucket"),
        _as_double(F.col(vec_col)).alias("cv"),
        F.col("_norm").alias("cn"),
    )
    sims = (
        left.join(right, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


def embedding_near_duplicates(emb: DataFrame, threshold: float = 0.98,
                              n_planes: int = N_PLANES, dims: int = 64,
                              vec_col: str = "embedding") -> DataFrame:
    """(vec_a, vec_b, sim) — embedding-cosine near-dup pairs (a < b) found
    via LSH buckets (near-identical vectors land in the same bucket with
    overwhelming probability at ≥0.98 cosine)."""
    b = lsh_buckets(emb, n_planes, dims, vec_col)
    e = with_norm(emb, vec_col).join(b, "vec_id")
    left = e.select(F.col("vec_id").alias("vec_a"), "bucket",
                    _as_double(F.col(vec_col)).alias("av"), F.col("_norm").alias("an"))
    right = e.select(F.col("vec_id").alias("vec_b"), "bucket",
                     _as_double(F.col(vec_col)).alias("bv"), F.col("_norm").alias("bn"))
    return (
        left.join(right, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b",
            F.round(_dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), 4).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
