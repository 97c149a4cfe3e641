"""Scale-safe global ordering primitives.

`Window.orderBy(col)` with no partitionBy funnels EVERY row through one
task — fine at sf0.1, a straggler at a web-scale row count. These
helpers compute the same results with the standard two-phase plan:

    1. bucket rows into ascending value ranges. The boundaries are
       approxQuantile cut points collected ONCE on the driver and baked
       into the plan as literals, so the bucket id is a deterministic
       codegen expression — NOT `repartitionByRange`, whose per-branch
       re-sampling can assign different boundaries to the offsets
       branch and the join branch of this very computation (range
       exchanges are only shared when the canonicalized plans match,
       and column pruning breaks that);
    2. per-bucket rank / running sum (Window.partitionBy(bucket) — full
       parallelism);
    3. per-bucket totals → tiny offsets table (≤ num_buckets rows; the
       only global window runs over THAT, which is bounded by the
       bucket count, not the data);
    4. broadcast-join the offsets back.

`order_col` must be numeric (all engine call sites rank long keys) and
duplicate-free. tests/test_plans.py locks the package to this module:
no `Window.orderBy(...)` without partitionBy may appear anywhere else
unless justified with a `bounded-window` marker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _bucketed(df: DataFrame, order_col: str, num_buckets: int | None) -> DataFrame:
    spark = df.sparkSession
    n = num_buckets or spark.sparkContext.defaultParallelism
    if n > 1:
        probs = [i / n for i in range(1, n)]
        bounds = sorted(set(df.approxQuantile(order_col, probs, 1.0 / (4 * n))))
    else:
        bounds = []
    pid = F.lit(0)
    for b in bounds:
        pid = pid + F.when(F.col(order_col) > F.lit(b), 1).otherwise(0)
    return df.withColumn("_pid", pid)


def _offsets(part: DataFrame, agg_col) -> DataFrame:
    """(_pid, _off) — exclusive prefix of the per-bucket totals.
    bounded-window: ≤ num_buckets rows, never data-sized. The partition
    key is a column-derived constant zero (pmod(_pid, 1)) — it keeps
    WindowExec from logging its single-partition warning on every rank
    (the frame IS one tiny partition by design) without being
    constant-folded out of the partition spec the way a literal is."""
    cnt = part.groupBy("_pid").agg(agg_col.alias("_tot"))
    w = (
        Window.partitionBy(F.pmod(F.col("_pid"), F.lit(1)))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return cnt.select(
        "_pid", F.coalesce(F.sum("_tot").over(w), F.lit(0)).alias("_off")
    )


def global_row_numbers(
    df: DataFrame,
    order_col: str,
    out_col: str = "rn",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """df + out_col = 0-based (plus `start`) global row number in
    ascending `order_col` order. `order_col` must be a duplicate-free
    numeric column (all engine call sites rank DISTINCT long keys),
    which makes row_number ≡ rank ≡ dense_rank."""
    part = _bucketed(df, order_col, num_partitions)
    off = _offsets(part, F.count(F.lit(1)))
    wlocal = Window.partitionBy("_pid").orderBy(order_col)
    return (
        part.join(F.broadcast(off), "_pid")
        .withColumn(
            out_col,
            (F.row_number().over(wlocal) - 1 + F.col("_off") + F.lit(start)).cast("long"),
        )
        .drop("_pid", "_off")
    )


def global_ranks_score_desc(
    df: DataFrame,
    score_col: str,
    tie_cols: list,
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """df + out_col = 0-based global row number in (score_col DESC,
    tie_cols ASC) order — the reference's PredictionsSorter::ScoreComp
    total order. Same two-phase plan: buckets cut on -score (equal
    scores share a bucket by construction of the strict `>` bucket
    expression), per-bucket window, broadcast offsets."""
    part = _bucketed(
        df.withColumn("_ord", -F.col(score_col).cast("double")), "_ord", num_partitions
    )
    off = _offsets(part, F.count(F.lit(1)))
    wlocal = Window.partitionBy("_pid").orderBy(
        [F.col("_ord")] + [F.col(c) for c in tie_cols]
    )
    return (
        part.join(F.broadcast(off), "_pid")
        .withColumn(
            out_col,
            (F.row_number().over(wlocal) - 1 + F.col("_off")).cast("long"),
        )
        .drop("_pid", "_off", "_ord")
    )


def global_prefix_sums(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """df + out_col = EXCLUSIVE running sum of `value_col` in ascending
    `order_col` order (row's own value not included — the offset shape
    sampling/unranking code wants). `order_col` must be duplicate-free."""
    part = _bucketed(df, order_col, num_partitions)
    off = _offsets(part, F.sum(value_col))
    wlocal = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        part.join(F.broadcast(off), "_pid")
        .withColumn(
            out_col,
            F.coalesce(F.sum(value_col).over(wlocal), F.lit(0)) + F.col("_off"),
        )
        .drop("_pid", "_off")
    )
