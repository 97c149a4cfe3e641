"""Exotic binary/exchange ingest formats: graph-tool binary (.gt) and
Rutherford-Boeing (.rb) — the last §2.1 reader group.

Reference:
- networkit/cpp/io/GraphToolBinaryReader.cpp:14-133 — layout:
    6-byte magic  e2 9b be 20 67 74 ('⛾ gt')
    version byte  0x01
    endian byte   0x00 little / 0x01 big          (:33-57)
    u64 comment length + comment bytes            (:59-68)
    1 byte directed                               (:70-81)
    u64 n                                         (:83-85)
    per node u = 0..n-1: u64 out-degree, then that many node ids of
    width 1/2/4/8 bytes chosen from n             (:87-115)
  Edges add with checkMultiEdge=true (duplicates warn + skip, :117-132).
- networkit/cpp/io/GraphToolBinaryWriter.cpp:20-127 — same layout back;
  undirected graphs list each edge once from the larger endpoint
  (v <= u, :69-81); non-continuous ids remap via getContinuousNodeIds.
- networkit/cpp/io/RBGraphReader.cpp:16-43 + RBMatrixReader.cpp:34-130 —
  Rutherford-Boeing compressed-column text: 4 header lines (title;
  totalRows nPtr nIdx nVal; fmt nCols nRows nVals; fortran formats),
  then 1-indexed pointer rows, row-index rows, value rows. fmt[0] ∈
  {r,i,p} (real/integer/pattern — else throw), fmt[1] == 's' ⇒
  symmetric ⇒ undirected, fmt[2] must be 'a' (assembled). Graph is
  (nCols, weighted=!pattern, directed=!symmetric); square matrices
  only.

Spark shape: both are single-file fixture-EXCHANGE formats (the same
class as DibaP/METIS/GML in this package) — the sequential header walk
runs driver-side over numpy views; the resulting edge table is a
distributed DataFrame like every other reader's output. Multi-gigabyte
ingest is the parquet/Iceberg path, not these formats; the writers
collect driver-side under the package's documented exchange-sink
policy.
"""

from __future__ import annotations

import struct

import numpy as np

from pyspark.sql import SparkSession, functions as F

from networkit_spark.graph import Graph

_GT_MAGIC = bytes([0xE2, 0x9B, 0xBE, 0x20, 0x67, 0x74])


def _gt_width(n: int) -> int:
    if n < 1 << 8:
        return 1
    if n < 1 << 16:
        return 2
    if n < 1 << 32:
        return 4
    return 8


def read_graphtool(spark: SparkSession, path: str) -> Graph:
    """GraphToolBinaryReader.cpp read(): header/version/endian checks,
    comment skip, directed byte, n, width-packed adjacency lists;
    duplicate arcs are dropped (checkMultiEdge semantics)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if len(buf) < 8 or buf[:6] != _GT_MAGIC or buf[6] != 0x01:
        raise ValueError("File header is broken")
    if buf[7] == 0x00:
        endian = "<"
    elif buf[7] == 0x01:
        endian = ">"
    else:
        raise ValueError("File header is broken")
    off = 8
    (clen,) = struct.unpack_from(f"{endian}Q", buf, off)
    off += 8 + clen
    directed = buf[off] == 0x01
    off += 1
    (n,) = struct.unpack_from(f"{endian}Q", buf, off)
    off += 8
    n = int(n)
    width = _gt_width(n)
    id_dtype = {1: "u1", 2: "u2", 4: "u4", 8: "u8"}[width]

    srcs: list[np.ndarray] = []
    dsts: list[np.ndarray] = []
    for u in range(n):
        (deg,) = struct.unpack_from(f"{endian}Q", buf, off)
        off += 8
        deg = int(deg)
        if deg:
            nbrs = np.frombuffer(buf, dtype=f"{endian}{id_dtype}",
                                 count=deg, offset=off)
            off += deg * width
            srcs.append(np.full(deg, u, dtype="int64"))
            dsts.append(nbrs.astype("int64"))
    if srcs:
        import pandas as pd

        pdf = pd.DataFrame(
            {"src": np.concatenate(srcs), "dst": np.concatenate(dsts)}
        )
        edges = spark.createDataFrame(pdf).dropDuplicates(["src", "dst"]) \
            .withColumn("weight", F.lit(1.0))
    else:
        edges = spark.createDataFrame([], "src long, dst long, weight double")
    return Graph.from_edges(
        edges, directed=directed, vertices=spark.range(n).select("id")
    )


def write_graphtool(graph: Graph, path: str, little_endian: bool = True) -> None:
    """GraphToolBinaryWriter.cpp write(): empty comment; undirected
    graphs emit each edge once from the larger endpoint (v <= u);
    non-continuous ids remap to their sorted rank (getContinuousNodeIds
    parity). Driver-side exchange sink (documented policy)."""
    endian = "<" if little_endian else ">"
    ids = sorted(r["id"] for r in graph.vertices().collect())
    remap = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    width = _gt_width(n)
    id_fmt = {1: "B", 2: "H", 4: "I", 8: "Q"}[width]

    adj: dict[int, list[int]] = {i: [] for i in range(n)}
    if graph.directed:
        for r in graph.edges.select("src", "dst").collect():
            adj[remap[r["src"]]].append(remap[r["dst"]])
    else:
        for r in graph.symmetrized_edges().select("src", "dst").collect():
            u, v = remap[r["src"]], remap[r["dst"]]
            if v <= u:
                adj[u].append(v)
    with open(path, "wb") as fh:
        fh.write(_GT_MAGIC)
        fh.write(bytes([0x01, 0x00 if little_endian else 0x01]))
        fh.write(struct.pack(f"{endian}Q", 0))  # empty comment
        fh.write(bytes([0x01 if graph.directed else 0x00]))
        fh.write(struct.pack(f"{endian}Q", n))
        for u in range(n):
            nbrs = adj[u]
            fh.write(struct.pack(f"{endian}Q", len(nbrs)))
            for v in nbrs:
                fh.write(struct.pack(f"{endian}{id_fmt}", v))


def read_rb(spark: SparkSession, path: str) -> Graph:
    """RBGraphReader.cpp + RBMatrixReader.cpp: Rutherford-Boeing
    compressed-column square matrix → graph. fmt[0] ∈ {r, i, p},
    fmt[1] == 's' ⇒ undirected, fmt[2] must be 'a'; indices in the
    file are 1-based."""
    with open(path) as fh:
        fh.readline()  # title line — text metadata only
        counts_line = fh.readline().split()
        n_ptr, n_idx, n_val = (int(x) for x in counts_line[1:4])
        fmt_line = fh.readline().split()
        fmt, n_cols, n_rows, n_vals = (
            fmt_line[0].lower(),
            int(fmt_line[1]),
            int(fmt_line[2]),
            int(fmt_line[3]),
        )
        if fmt[0] not in "rip":
            raise ValueError(
                "Unsupported format: only real, integer, and pattern "
                "formats are supported."
            )
        pattern_only = fmt[0] == "p"
        symmetric = fmt[1] == "s"
        if fmt[2] != "a":
            raise ValueError(
                "Unsupported format: only compressed column format is supported."
            )
        if n_cols != n_rows:
            raise ValueError(
                "File does not contain a square matrix - cannot parse "
                "this file into a graph!"
            )
        fh.readline()  # fortran format specs — not needed
        body = fh.read().split("\n")

    nums: list[str] = []
    for line in body:
        nums.extend(line.split())
    pointers = np.array(nums[: n_cols + 1], dtype="int64") - 1
    rowindex = (
        np.array(nums[n_cols + 1 : n_cols + 1 + n_vals], dtype="int64") - 1
    )
    if pattern_only:
        values = np.ones(n_vals)
    else:
        values = np.array(
            nums[n_cols + 1 + n_vals : n_cols + 1 + 2 * n_vals], dtype="float64"
        )

    rows = []
    for col in range(n_cols):
        for idx in range(int(pointers[col]), int(pointers[col + 1])):
            rows.append((int(rowindex[idx]), col, float(values[idx])))
    edges = spark.createDataFrame(rows, "src long, dst long, weight double") \
        if rows else spark.createDataFrame([], "src long, dst long, weight double")
    return Graph.from_edges(
        edges,
        directed=not symmetric,
        weighted=not pattern_only,
        vertices=spark.range(n_cols).select("id"),
    )
