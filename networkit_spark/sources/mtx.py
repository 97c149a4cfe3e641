"""Matrix Market (.mtx) graph reader/writer.

Reference: networkit/cpp/io/MTXGraphReader.cpp:9-34 and
cpp/io/MTXParser.cpp (parseLine:13-27, getHeader:36-70,
getMatrixSize:72-90). Semantics reproduced:

- header line `%%MatrixMarket matrix coordinate <field> <symmetry>`
  (case-insensitive fields, `%MatrixMarket` accepted too);
- `field == pattern`  -> unweighted graph (MTXGraphReader.cpp:17-18);
  every other field  -> weighted, entry value = edge weight, a missing
  value column falls back to weight 1.0 (parseLine's optional value +
  Graph default edge weight);
- `symmetry == general` -> DIRECTED graph; `symmetric` -> undirected
  (MTXGraphReader.cpp:19-20 — note the reference treats symmetric
  files' single stored triangle as the undirected edge set);
- indices are 1-based (parseLine decrements);
- n = max(rows, columns) (MTXGraphReader.cpp:22), so isolated vertices
  at the tail of the dimension range exist explicitly.

Scale design: unlike GML/GraphML (driver-side exchange parsers), MTX
bodies are routinely millions of nonzeros (SuiteSparse), so the DATA
section parses distributed: `spark.read.text` -> comment filter ->
whitespace split, all JVM-side. Only the header/size preamble is
resolved via the same bounded single-file window read_metis uses —
per the MTX spec all comments precede the size line, so line 1 of the
comment-filtered stream IS the size line and everything after is data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from networkit_spark.graph import Graph

_FIELDS = {"real", "integer", "complex", "pattern"}
_SYMMETRIES = {"general", "symmetric", "skew-symmetric", "hermitian"}


def read_mtx(spark: SparkSession, path: str) -> Graph:
    """MTXGraphReader.read parity (see module docstring)."""
    with open(path, encoding="utf-8", errors="replace") as fh:
        header = fh.readline().split()
    if (
        len(header) < 5
        or header[0] not in ("%%MatrixMarket", "%MatrixMarket")
        or header[1].lower() != "matrix"
        or header[2].lower() != "coordinate"
    ):
        raise ValueError(f"not a coordinate MatrixMarket file: {path}")
    field, symmetry = header[3].lower(), header[4].lower()
    if field not in _FIELDS or symmetry not in _SYMMETRIES:
        raise ValueError(f"invalid MTX header field/symmetry: {header[3:5]}")
    weighted = field != "pattern"
    directed = symmetry == "general"

    lines = (
        spark.read.text(path)
        .select(
            F.monotonically_increasing_id().alias("lineno"),
            F.trim("value").alias("value"),
        )
        .filter(~F.col("value").startswith("%"))
        .filter(F.col("value") != "")
    )
    # MTX is a single-file format whose preamble (header comments + the
    # one size line) precedes all data by spec — this is a
    # bounded-window: it only disambiguates that first line, order
    # within the single input split.
    w = Window.partitionBy(F.pmod(F.col("lineno"), F.lit(1))).orderBy("lineno")
    numbered = lines.withColumn("rn", F.row_number().over(w))
    size = numbered.filter("rn = 1").select("value").first()["value"].split()
    n = max(int(size[0]), int(size[1]))

    toks = numbered.filter("rn > 1").select(
        F.split("value", r"\s+").alias("p")
    )
    weight = (
        # try_element_at: a pattern-less real file may omit the value
        # column on some lines; missing -> default weight 1.0
        F.coalesce(
            F.try_element_at("p", F.lit(3)).cast("double"), F.lit(1.0)
        )
        if weighted
        else F.lit(1.0)
    )
    edges = toks.select(
        (F.element_at("p", 1).cast("long") - 1).alias("src"),
        (F.element_at("p", 2).cast("long") - 1).alias("dst"),
        weight.alias("weight"),
    )
    vertices = spark.range(n).select("id")
    return Graph.from_edges(
        edges, directed=directed, weighted=weighted, vertices=vertices
    )


def write_mtx(graph: Graph, path: str) -> None:
    """Inverse of read_mtx: coordinate format, 1-based, `general` for
    directed graphs / `symmetric` (lower-triangle-once) for undirected,
    `pattern` for unweighted / `real` otherwise. Driver-side single-file
    serialization (exchange path, like write_gml); a scale sink would
    write the edge table as parquet."""
    n = graph.vertices().agg(F.max("id")).first()[0]
    n = int(n) + 1 if n is not None else 0
    e = graph.edges
    if not graph.directed:
        # store each undirected edge once, row >= col (MTX symmetric
        # convention stores the lower triangle)
        e = e.filter(F.col("src") >= F.col("dst"))
    rows = e.select("src", "dst", "weight").collect()
    field = "real" if graph.weighted else "pattern"
    symmetry = "general" if graph.directed else "symmetric"
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(f"%%MatrixMarket matrix coordinate {field} {symmetry}\n")
        fh.write(f"{n} {n} {len(rows)}\n")
        for r in rows:
            base = f"{int(r['src']) + 1} {int(r['dst']) + 1}"
            fh.write(
                f"{base} {r['weight']:g}\n" if graph.weighted else base + "\n"
            )


def _looks_like_mtx(first_line: str) -> bool:
    return first_line.split()[:1] in (["%%MatrixMarket"], ["%MatrixMarket"])


__all__ = ["read_mtx", "write_mtx"]
