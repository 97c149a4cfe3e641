"""Cover / partition / dynamic-event file formats.

Reference:
- CoverReader.cpp:8-32 — non-comment line i lists the member nodes of
  subset i (whitespace separated).
- CoverWriter.cpp:8-25 — one line per subset in ascending subset order,
  members in insertion (ascending node) order, trailing space.
- EdgeListCoverReader.cpp — line = node id (firstNode-based) followed by
  the subsets it belongs to.
- EdgeListPartitionReader.cpp:10-41 — line = "node{sep}cluster",
  firstNode-based node ids.
- DGSReader.cpp:15-120 — DGS004 event stream: `st` (time step), `an
  <name> [attrs]` (add node, names mapped to ids in encounter order),
  `ae <name> <from> <to>` (add edge, weight 1), `ce <from>-<to> <w>`
  (edge weight update), `dn`/`de` analogously for deletions.

Spark shapes: the line-per-SUBSET / line-per-NODE text formats carry
meaning in FILE ORDER, so readers use the engine's line-number pattern
(read_partition precedent); DGS is a sequential event log whose node
names resolve by encounter order — parsed driver-side like the GML
family, emitting the engine's GraphEvent DataFrame
(generators.growth_events schema)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def read_cover(spark: SparkSession, path: str) -> DataFrame:
    """(id, c) membership rows — CoverReader semantics."""
    lines = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("lineno"),
        F.trim("value").alias("value"),
    ).filter(~F.col("value").startswith("#"))
    # bounded-window: one sequential text file by definition (the subset
    # index IS the line number)
    w = Window.orderBy("lineno")
    numbered = lines.withColumn("c", (F.row_number().over(w) - 1).cast("long"))
    return (
        numbered.select(
            "c", F.explode(F.split("value", r"\s+")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .select(F.col("tok").cast("long").alias("id"), "c")
    )


def write_cover(cover: DataFrame, path: str):
    """CoverWriter: one line per subset (ascending c), members ascending,
    trailing space — byte parity with the reference writer."""
    (
        cover.groupBy("c")
        .agg(F.array_sort(F.collect_list(F.col("id").cast("string"))).alias("ms"))
        .orderBy("c")
        .select(
            F.concat(F.concat_ws(" ", F.transform(
                F.col("ms"), lambda x: x)), F.lit(" ")).alias("value")
        )
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def read_edge_list_cover(
    spark: SparkSession, path: str, first_node: int = 1
) -> DataFrame:
    """(id, c) — EdgeListCoverReader: line = node followed by its
    subsets; node ids shift down by first_node."""
    lines = (
        spark.read.text(path)
        .select(F.trim("value").alias("value"))
        .filter(~F.col("value").startswith("#") & (F.col("value") != ""))
    )
    toks = lines.select(F.split("value", r"\s+").alias("t"))
    return toks.select(
        (F.element_at("t", 1).cast("long") - first_node).alias("id"),
        F.explode(F.slice("t", 2, 1_000_000)).alias("ctok"),
    ).select("id", F.col("ctok").cast("long").alias("c"))


def read_edge_list_partition(
    spark: SparkSession, path: str, first_node: int = 1, sep: str = " "
) -> DataFrame:
    """(id, label) — EdgeListPartitionReader: 'node{sep}cluster' lines."""
    lines = (
        spark.read.text(path)
        .select(F.trim("value").alias("value"))
        .filter(~F.col("value").startswith("#") & (F.col("value") != ""))
    )
    toks = lines.select(F.split("value", sep).alias("t"))
    return toks.select(
        (F.element_at("t", 1).cast("long") - first_node).alias("id"),
        F.element_at("t", 2).cast("long").alias("label"),
    )


def read_dgs(spark: SparkSession, path: str) -> DataFrame:
    """GraphEvent DataFrame (step, seq, type, u, v, weight) from a
    DGS004 file — DGSReader.cpp tag semantics (`st`/`an`/`ae`, plus
    `dn`/`de` as NODE_REMOVAL/EDGE_REMOVAL and `ce` as
    EDGE_WEIGHT_UPDATE); node names resolve to 0-based ids in encounter
    order. Sequential event log → driver-side parse (GML-family
    policy), distributed output."""
    names: dict[str, int] = {}
    rows = []
    step, seq = 1, 0

    def nid(name: str) -> int:
        if name not in names:
            names[name] = len(names)
        return names[name]

    with open(path, encoding="utf-8", errors="replace") as fh:
        first = fh.readline().strip()
        if first != "DGS004":
            raise ValueError("expected DGS004 magic cookie")
        fh.readline()  # name / clock / event counts
        for line in fh:
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "st":
                # tick sentinel seq matches generators.growth_events
                rows.append((step, 1 << 20, "TIME_STEP", None, None, None))
                step, seq = step + 1, 0
            elif tag == "an" and len(parts) >= 2:
                rows.append((step, seq, "NODE_ADDITION", nid(parts[1]), None, None))
                seq += 1
            elif tag == "ae" and len(parts) >= 4:
                rows.append(
                    (step, seq, "EDGE_ADDITION", nid(parts[2]), nid(parts[3]), 1.0)
                )
                seq += 1
            elif tag == "dn" and len(parts) >= 2:
                rows.append((step, seq, "NODE_REMOVAL", nid(parts[1]), None, None))
                seq += 1
            elif tag == "de" and len(parts) >= 4:
                rows.append(
                    (step, seq, "EDGE_REMOVAL", nid(parts[2]), nid(parts[3]), None)
                )
                seq += 1
            elif tag == "ce" and len(parts) >= 3:
                a, _, b = parts[1].partition("-")
                rows.append(
                    (step, seq, "EDGE_WEIGHT_UPDATE", nid(a), nid(b),
                     float(parts[2]))
                )
                seq += 1
    return spark.createDataFrame(
        rows,
        "step long, seq long, type string, u long, v long, weight double",
    )
