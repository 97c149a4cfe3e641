"""HashingOverlapper (reference: cpp/overlap/HashingOverlapper.cpp):
combine several partitions of the same node set into one partition whose
subsets are the intersections ("cores") of the input subsets, keyed by a
deterministic hash — so the whole operator is exact and has a bit-exact
DuckDB twin.

Reference semantics reproduced (HashingOverlapper.cpp run()):
- 0 clusterings → the one-clustering (all nodes label 0);
- 1 clustering  → that clustering (compacted);
- 2 clusterings → core(v) = djb2(((first[v] ^ 0xffff) << 16)
                              | (second[v] ^ 0xffff));
- ≥3            → core(v) = Σ_c (djb2((c + 2) · zeta_c[v]) & 0xffff)
                  starting from the 1-clustering (0);
- finally Partition::compact (Partition.cpp:67-81): new label = dense
  rank of the old label in ascending order.

djb2 (the reference's lambda) walks the LITTLE-ENDIAN bytes of the
64-bit key, stopping at the first zero byte: h = 5381; while byte != 0:
h = h·33 + byte. Eight unrolled steps keep every intermediate below
5381·33⁸ + Σ 255·33^k < 2^63, so Spark (ANSI) and DuckDB compute the
identical exact integer result — no wraparound is ever exercised.

Input labels are COMPACTED first (the reference assumes small dense
subset ids — raw 64-bit hash labels would overflow the (a << 16) | b
key packing). The compaction itself uses the engine's two-phase global
ranking (no single-partition window).

Spark shape: one broadcast-joined dictionary per input clustering
(distinct labels → dense ranks — tiny), then a single projection
computing the key and the unrolled djb2 — no extra shuffle beyond the
final compact's dictionary build.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.ranking import global_row_numbers


def _djb2(key: Column) -> Column:
    """Unrolled djb2 over the little-endian bytes of a NON-NEGATIVE
    int64 key, stopping at the first zero byte (shared arithmetic with
    oracles.djb2_sql_chain — change together)."""
    h = F.lit(5381).cast("long")
    stopped = F.lit(False)
    for i in range(8):
        byte = F.shiftright(key, 8 * i).bitwiseAND(F.lit(255))
        stopped = stopped | (byte == 0)
        h = F.when(stopped, h).otherwise(h * F.lit(33) + byte)
    return h


def _compact(labels: DataFrame) -> DataFrame:
    """Partition::compact(useTurbo=false): dense-rank labels ascending."""
    dic = global_row_numbers(
        labels.select(F.col("label").alias("old")).distinct(), "old", "new"
    )
    return (
        labels.join(F.broadcast(dic), labels.label == dic.old)
        .select("id", F.col("new").alias("label"))
    )


def hashing_overlapper(g: Graph, clusterings: list[DataFrame]) -> DataFrame:
    """(id, label) — the hashed core partition over g's vertices. Each
    input clustering is (id, label) covering every vertex."""
    v = g.vertices()
    if len(clusterings) == 0:
        # reference ERROR-logs and returns the 1-clustering
        return v.select("id", F.lit(0).cast("long").alias("label"))
    compacted = [_compact(c.select("id", "label")) for c in clusterings]
    if len(compacted) == 1:
        return compacted[0]
    if len(compacted) == 2:
        first, second = compacted
        joined = (
            v.join(first.withColumnRenamed("label", "c1"), "id")
            .join(second.withColumnRenamed("label", "c2"), "id")
        )
        key = F.shiftleft(
            F.col("c1").bitwiseXOR(F.lit(0xFFFF)), 16
        ).bitwiseOR(F.col("c2").bitwiseXOR(F.lit(0xFFFF)))
        cores = joined.select("id", _djb2(key).alias("label"))
        return _compact(cores)
    # ≥3: additive 16-bit-masked hashes per clustering
    terms = []
    for c_idx, c in enumerate(compacted):
        key = F.lit(c_idx + 2) * F.col("label")
        terms.append(
            c.select("id", _djb2(key).bitwiseAND(F.lit(0xFFFF)).alias(f"t{c_idx}"))
        )
    joined = reduce(lambda a, b: a.join(b, "id"), terms, v)
    total = reduce(
        lambda a, b: a + b, [F.col(f"t{i}") for i in range(len(compacted))]
    )
    cores = joined.select("id", total.cast("long").alias("label"))
    return _compact(cores)
