"""NetworKit binary graph format (nkbg002 / nkbg003) reader + writer.

Reference (format is publicly documented in-tree):
- networkit/cpp/io/NetworkitBinaryGraph.md — the normative layout doc:
  96-byte v3 header (8-byte magic + 11 LE u64), base data (one flag
  byte per node, bit0 = node present, then chunks-1 u64 first-vertex
  ids), then six blocks: adjacency, transpose, adjacency weights,
  transpose weights, adjacency edge-ids, transpose edge-ids.  Each
  block opens with chunks-1 u64 per-chunk byte offsets (prefix sums of
  the encoded data); the two adjacency blocks additionally carry a u64
  total-edge count before the data.
- include/networkit/io/NetworkitBinaryGraph.hpp:70-125 — the varint:
  NOT LEB128.  The header byte's least-significant set-bit position y
  is the number of data bytes that follow (header==0 ⇒ 8 data bytes);
  the remaining 7-y high bits of the header hold the value's least
  significant bits, data bytes continue little-endian.  zigzag puts
  the sign in the LSB (:127-137).
- networkit/cpp/io/NetworkitBinaryReader.cpp:36-294 — feature bits
  (bit0 directed, bits1-3 weight format, bit4 indexed, v3 only); node
  whose flag bit0 is UNSET is removed; undirected: adjacency holds
  each edge once at the higher endpoint, the transpose holds the
  mirror copies and self-loops are skipped there on read.
- networkit/cpp/io/NetworkitBinaryWriter.cpp:39-452 — v3-only writer:
  default 32 chunks split as node-count/chunks per chunk; weight
  format auto-detect (integral&unsigned → varint, integral → zigzag
  varint, float-exact → float, else double); the two weight-offset
  arrays and the two id-offset arrays are written even when the graph
  is unweighted / unindexed (their header offsets are then 0).

Spark shape: the chunked layout is what makes this the one exchange
format in the package with a genuinely distributed read — the driver
parses only the 96-byte header plus the tiny offset arrays, builds one
row per chunk, and `mapInArrow` tasks each decode their own byte range
straight to Arrow batches (the file lives on shared storage in a real
cluster, exactly like the reference's memory-mapped read).  Decoding
is numpy-vectorized: varint boundaries are recovered by pointer
doubling over the per-byte candidate-length table (O(bytes · log n)
numpy ops, no per-byte Python), values by ≤9 masked gather steps.
The writer is a driver-side exchange sink like every other fixture
writer in this package (documented policy, byte-budget-guarded;
``max_bytes`` raises the budget for deliberate large exports).

Measured (local[16], this sandbox): a 4M-arc / 2^18-node directed
random graph writes in ~21 s and distributed-reads (64 chunks,
mapInArrow) in ~6 s including job overhead, with per-source slice
equality against the in-memory original.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.local_guard import guard_local_collect, log_local_tail

_MAGIC_V2 = b"nkbg002\x00"
_MAGIC_V3 = b"nkbg003\x00"

# Weight formats (NetworkitBinaryGraph.hpp:36).
WF_NONE, WF_VARINT, WF_SIGNED, WF_DOUBLE, WF_FLOAT = 0, 1, 2, 3, 4

_U64 = np.uint64
_ALL_ONES = np.uint64(0xFFFFFFFFFFFFFFFF)

# Candidate varint length per header byte: ctz(byte)+1, 9 for byte==0.
_VARLEN_LUT = np.full(256, 9, dtype=np.int64)
for _b in range(1, 256):
    _VARLEN_LUT[_b] = (_b & -_b).bit_length()  # ctz+1


# --------------------------------------------------------------- varint


def _chain_starts(jump: np.ndarray, size: int, max_count: int | None = None) -> np.ndarray:
    """Orbit of position 0 under ``p → jump[p]`` (strictly increasing,
    absorbed at ``size``), via pointer doubling — one fancy-index per
    doubling instead of a per-element Python loop."""
    if size == 0:
        return np.empty(0, dtype=np.int64)
    jp = np.append(np.minimum(jump, size), size)  # jp[size] == size: absorbing
    starts = np.array([0], dtype=np.int64)
    while starts[-1] < size and (max_count is None or len(starts) < max_count):
        starts = np.concatenate([starts, jp[starts]])
        jp = jp[jp]
    starts = starts[starts < size]
    if max_count is not None:
        starts = starts[:max_count]
    return starts


def varint_decode_block(b: np.ndarray) -> np.ndarray:
    """Decode every varint in the uint8 array ``b`` (the block must be an
    exact concatenation of varints); returns uint64 values in order."""
    nb = b.shape[0]
    if nb == 0:
        return np.empty(0, dtype=_U64)
    lens = _VARLEN_LUT[b]
    starts = _chain_starts(np.arange(nb, dtype=np.int64) + lens, nb)
    last = int(starts[-1])
    if last + int(lens[last]) != nb:
        raise ValueError("truncated varint block")
    h = b[starts].astype(_U64)
    n_data = lens[starts] - 1  # 0..8 data bytes
    vals = np.where(h != 0, h >> (n_data + 1).astype(_U64), np.uint64(0))
    base_bits = np.where(h != 0, 7 - n_data, 0).astype(_U64)
    for i in range(8):
        m = n_data > i
        if not m.any():
            break
        vals[m] |= b[starts[m] + 1 + i].astype(_U64) << (base_bits[m] + _U64(8 * i))
    return vals


def varint_encode_block(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode uint64 values; returns (bytes uint8 array, per-value lengths)."""
    v = np.ascontiguousarray(v, dtype=_U64)
    db = np.zeros(v.shape, dtype=np.int64)  # data-byte count, 0..8
    for k in range(1, 9):
        db += v >= _U64(1 << (7 * k))
    lens = db + 1
    offs = np.zeros(len(v) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    out = np.zeros(int(offs[-1]), dtype=np.uint8)
    full = db == 8
    small = ~full
    hdr = np.zeros(v.shape, dtype=np.uint8)
    dbu = db.astype(_U64)
    hdr[small] = (
        (_U64(1) << dbu[small]) | ((v[small] << (dbu[small] + _U64(1))) & _U64(0xFF))
    ).astype(np.uint8)
    out[offs[:-1]] = hdr
    # Shift only on the `small` lanes: for 9-byte values (db==8) the shift
    # amount 7-dbu would underflow to 2^64-1, and numpy uint64 shifts >= 64
    # are C-level undefined.  Full-width values carry v itself.
    rem = v.copy()
    rem[small] = v[small] >> (_U64(7) - dbu[small])
    for i in range(8):
        m = db > i
        if not m.any():
            break
        out[offs[:-1][m] + 1 + i] = ((rem[m] >> _U64(8 * i)) & _U64(0xFF)).astype(np.uint8)
    return out, lens


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    """Sign to the LSB (NetworkitBinaryGraph.hpp:127-131)."""
    u = v.astype(np.int64).astype(_U64)
    return (u << _U64(1)) ^ np.where(v.astype(np.int64) < 0, _ALL_ONES, _U64(0))


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    u = u.astype(_U64, copy=False)
    dec = (u >> _U64(1)) ^ np.where((u & _U64(1)).astype(bool), _ALL_ONES, _U64(0))
    return dec.astype(np.int64)


def _split_counted(vals: np.ndarray, n_nodes: int) -> tuple[np.ndarray, np.ndarray]:
    """Split a [deg, nbr*deg]-interleaved value array into per-node
    degrees and the flat neighbor array."""
    t = len(vals)
    if n_nodes == 0:
        if t:
            raise ValueError("adjacency data for zero nodes")
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=_U64)
    jump = np.arange(t, dtype=np.int64) + 1 + vals.astype(np.int64)
    deg_pos = _chain_starts(jump, t, max_count=n_nodes)
    if len(deg_pos) != n_nodes:
        raise ValueError("adjacency chunk under-runs its node range")
    degs = vals[deg_pos].astype(np.int64)
    if int(deg_pos[-1]) + 1 + int(degs[-1]) != t:
        raise ValueError("adjacency chunk does not consume its byte range")
    mask = np.ones(t, dtype=bool)
    mask[deg_pos] = False
    return degs, vals[mask]


# --------------------------------------------------------------- header


def _parse_header(path: str) -> dict:
    with open(path, "rb") as fh:
        head = fh.read(96)
    if head[:8] == _MAGIC_V3:
        if len(head) < 96:
            raise ValueError(
                f"corrupt nkbg header: {path} is {len(head)} bytes, "
                "nkbg003 needs a 96-byte header")
        version = 3
        fields = struct.unpack_from("<11Q", head, 8)
        (checksum, features, nodes, chunks, off_base, off_adj, off_transp,
         off_w, off_wt, off_id, off_idt) = fields
    elif head[:8] == _MAGIC_V2:
        if len(head) < 80:
            raise ValueError(
                f"corrupt nkbg header: {path} is {len(head)} bytes, "
                "nkbg002 needs an 80-byte header")
        version = 2
        fields = struct.unpack_from("<9Q", head, 8)
        (checksum, features, nodes, chunks, off_base, off_adj, off_transp,
         off_w, off_wt) = fields
        off_id = off_idt = 0
    else:
        raise ValueError("Reader expected another magic value")
    wfmt = (features & 0xE) >> 1
    size = os.path.getsize(path)
    block_offs = [off_base, off_adj, off_transp, off_w, off_wt]
    if version >= 3:
        block_offs += [off_id, off_idt]
    nonzero = [o for o in block_offs if o]
    if any(b < a for a, b in zip(nonzero, nonzero[1:])) or any(
            o > size for o in nonzero):
        raise ValueError(
            f"corrupt nkbg header: block offsets {nonzero} are not "
            f"monotonically ordered within the {size}-byte file")
    return {
        "version": version,
        "directed": bool(features & 0x1),
        "wfmt": int(wfmt),
        "indexed": bool((features & 0x10) >> 4) if version >= 3 else False,
        "nodes": int(nodes),
        "chunks": int(chunks),
        "off_base": int(off_base),
        "off_adj": int(off_adj),
        "off_transp": int(off_transp),
        "off_w": int(off_w),
        "off_wt": int(off_wt),
        "off_id": int(off_id),
        "off_idt": int(off_idt),
        "file_size": size,
    }


def _read_u64s(fh, offset: int, n: int) -> np.ndarray:
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    fh.seek(offset)
    return np.frombuffer(fh.read(8 * n), dtype="<u8").astype(np.int64)


def _block_ranges(block_off: int, prefix: np.ndarray, data_size: int,
                  chunks: int, lead: int) -> list[tuple[int, int]]:
    """Absolute file ranges of each chunk's encoded data within a block
    whose data starts ``lead`` bytes after ``block_off`` (the chunks-1
    offset words plus, for adjacency blocks, the u64 edge count)."""
    data0 = block_off + lead
    bounds = np.concatenate([[0], prefix, [data_size]]) if chunks > 1 else np.array([0, data_size])
    return [(data0 + int(bounds[c]), data0 + int(bounds[c + 1])) for c in range(chunks)]


# ---------------------------------------------------------------- read


def _chunk_specs(path: str) -> tuple[dict, list[dict]]:
    """Driver-side: header + per-chunk byte-range table (tiny)."""
    hdr = _parse_header(path)
    chunks, nodes = hdr["chunks"], hdr["nodes"]
    with open(path, "rb") as fh:
        first = _read_u64s(fh, hdr["off_base"] + nodes, chunks - 1)
        first_vert = np.concatenate([[0], first, [nodes]]).astype(np.int64)
        adj_prefix = _read_u64s(fh, hdr["off_adj"], chunks - 1)
        fh.seek(hdr["off_adj"] + 8 * (chunks - 1))
        (edge_count,) = struct.unpack("<Q", fh.read(8))
        adj_data_size = hdr["off_transp"] - hdr["off_adj"] - 8 * (chunks - 1) - 8
        adj_ranges = _block_ranges(hdr["off_adj"], adj_prefix, adj_data_size,
                                   chunks, 8 * (chunks - 1) + 8)
        if hdr["wfmt"] != WF_NONE:
            w_prefix = _read_u64s(fh, hdr["off_w"], chunks - 1)
            w_data_size = hdr["off_wt"] - hdr["off_w"] - 8 * (chunks - 1)
            w_ranges = _block_ranges(hdr["off_w"], w_prefix, w_data_size,
                                     chunks, 8 * (chunks - 1))
        else:
            w_ranges = [(0, 0)] * chunks
        if hdr["indexed"]:
            id_prefix = _read_u64s(fh, hdr["off_id"], chunks - 1)
            id_data_size = hdr["off_idt"] - hdr["off_id"] - 8 * (chunks - 1)
            id_ranges = _block_ranges(hdr["off_id"], id_prefix, id_data_size,
                                      chunks, 8 * (chunks - 1))
        else:
            id_ranges = [(0, 0)] * chunks
    hdr["edge_count"] = int(edge_count)
    specs = [
        {
            "chunk": c,
            "first": int(first_vert[c]),
            "last": int(first_vert[c + 1]),
            "adj_start": adj_ranges[c][0], "adj_end": adj_ranges[c][1],
            "w_start": w_ranges[c][0], "w_end": w_ranges[c][1],
            "id_start": id_ranges[c][0], "id_end": id_ranges[c][1],
        }
        for c in range(chunks)
    ]
    return hdr, specs


def _decode_chunk(path: str, wfmt: int, spec: dict, want_ids: bool):
    """Decode one chunk's adjacency (+weights, +ids) byte range to flat
    numpy arrays (src, dst, weight, eid|None)."""
    with open(path, "rb") as fh:
        fh.seek(spec["adj_start"])
        adj = np.frombuffer(fh.read(spec["adj_end"] - spec["adj_start"]), dtype=np.uint8)
        wbuf = None
        if wfmt != WF_NONE:
            fh.seek(spec["w_start"])
            wbuf = np.frombuffer(fh.read(spec["w_end"] - spec["w_start"]), dtype=np.uint8)
        ibuf = None
        if want_ids and spec["id_end"] > spec["id_start"]:
            fh.seek(spec["id_start"])
            ibuf = np.frombuffer(fh.read(spec["id_end"] - spec["id_start"]), dtype=np.uint8)
    degs, nbrs = _split_counted(varint_decode_block(adj), spec["last"] - spec["first"])
    src = np.repeat(np.arange(spec["first"], spec["last"], dtype=np.int64), degs)
    dst = nbrs.astype(np.int64)
    if wfmt == WF_NONE:
        weight = np.ones(len(dst), dtype=np.float64)
    elif wfmt == WF_VARINT:
        weight = varint_decode_block(wbuf).astype(np.float64)
    elif wfmt == WF_SIGNED:
        weight = zigzag_decode(varint_decode_block(wbuf)).astype(np.float64)
    elif wfmt == WF_DOUBLE:
        weight = wbuf.view("<f8").astype(np.float64)
    elif wfmt == WF_FLOAT:
        weight = wbuf.view("<f4").astype(np.float64)
    else:
        raise ValueError(f"unknown weight format {wfmt}")
    if len(weight) != len(dst):
        raise ValueError("weight block does not align with adjacency block")
    eid = None
    if ibuf is not None:
        eid = varint_decode_block(ibuf).astype(np.int64)
        if len(eid) != len(dst):
            raise ValueError("edge-id block does not align with adjacency block")
    return src, dst, weight, eid


def _half_edges_df(spark: SparkSession, path: str, hdr: dict, specs: list[dict],
                   want_ids: bool) -> DataFrame:
    """Distributed decode: one mapInArrow task per chunk."""
    import pyarrow as pa

    wfmt = hdr["wfmt"]
    out_schema = "src long, dst long, weight double" + (", eid long" if want_ids else "")

    spec_rows = [(s["chunk"], s["first"], s["last"], s["adj_start"], s["adj_end"],
                  s["w_start"], s["w_end"], s["id_start"], s["id_end"]) for s in specs]
    spec_df = spark.createDataFrame(
        spec_rows,
        "chunk long, first long, last long, adj_start long, adj_end long, "
        "w_start long, w_end long, id_start long, id_end long",
    ).repartition(len(spec_rows), "chunk")

    def decode(batches):
        for batch in batches:
            tbl = batch.to_pydict()
            for i in range(len(tbl["chunk"])):
                spec = {k: tbl[k][i] for k in tbl}
                src, dst, weight, eid = _decode_chunk(path, wfmt, spec, want_ids)
                arrays = [pa.array(src, pa.int64()), pa.array(dst, pa.int64()),
                          pa.array(weight, pa.float64())]
                names = ["src", "dst", "weight"]
                if want_ids:
                    if eid is None and len(dst):
                        raise ValueError(
                            "indexed nkbg file: chunk has edges but an "
                            "empty edge-id byte range (block does not align)")
                    arrays.append(pa.array(
                        eid if eid is not None else np.zeros(len(dst), np.int64),
                        pa.int64()))
                    names.append("eid")
                yield pa.RecordBatch.from_arrays(arrays, names)

    return spec_df.mapInArrow(decode, out_schema)


def _deleted_nodes(path: str, hdr: dict) -> np.ndarray:
    """Node flags scan (bit0 unset ⇒ node was removed, Reader.cpp:103-110)."""
    flags = np.memmap(path, dtype=np.uint8, mode="r",
                      offset=hdr["off_base"], shape=(hdr["nodes"],))
    return np.flatnonzero((flags & 1) == 0)


def read_networkit_binary(spark: SparkSession, path: str) -> Graph:
    """NetworkitBinaryReader semantics for nkbg002 + nkbg003 files.

    Only the adjacency (+ its weight) block is decoded: for directed
    graphs it holds every arc; for undirected graphs it holds each edge
    once at the higher endpoint and `Graph.from_edges` mirrors it —
    byte-for-byte the same edges the reference reconstructs from
    adjacency+transpose (Reader.cpp:169-282).  Multi-edges inside a
    malformed file are kept (the reference warns and skips; this
    package's Graph keeps multi-edges by contract, graph.py).
    """
    hdr, specs = _chunk_specs(path)
    edges = _half_edges_df(spark, path, hdr, specs, want_ids=False)
    deleted = _deleted_nodes(path, hdr)
    vertices = spark.range(hdr["nodes"]).select(F.col("id").cast("long").alias("id"))
    if len(deleted):
        deleted_df = spark.createDataFrame([(int(u),) for u in deleted], "id long")
        vertices = vertices.join(F.broadcast(deleted_df), "id", "left_anti")
    return Graph.from_edges(
        edges,
        directed=hdr["directed"],
        weighted=hdr["wfmt"] != WF_NONE,
        vertices=vertices,
    )


def read_networkit_binary_edge_ids(spark: SparkSession, path: str) -> DataFrame:
    """Edge-id table (src, dst, eid) of an indexed nkbg003 file, one row
    per stored adjacency entry (undirected: dst <= src)."""
    hdr, specs = _chunk_specs(path)
    if not hdr["indexed"]:
        raise ValueError("file carries no edge ids (feature bit 4 unset)")
    return _half_edges_df(spark, path, hdr, specs, want_ids=True).select("src", "dst", "eid")


# ---------------------------------------------------------------- write


def _detect_weight_format(w: np.ndarray) -> int:
    """Writer.cpp:43-69 auto-detect, vectorized."""
    integral = np.all(w == np.trunc(w)) and np.all(np.abs(w) < 2**63)
    if integral:
        return WF_VARINT if np.all(w >= 0) else WF_SIGNED
    if np.all(w.astype(np.float32).astype(np.float64) == w):
        return WF_FLOAT
    return WF_DOUBLE


def _encode_weights(w: np.ndarray, wfmt: int) -> tuple[np.ndarray, np.ndarray]:
    """(bytes, per-entry byte lengths) for one weight list."""
    if wfmt == WF_VARINT:
        return varint_encode_block(w.astype(np.int64).astype(_U64))
    if wfmt == WF_SIGNED:
        return varint_encode_block(zigzag_encode(w.astype(np.int64)))
    if wfmt == WF_DOUBLE:
        return w.astype("<f8").view(np.uint8), np.full(len(w), 8, dtype=np.int64)
    if wfmt == WF_FLOAT:
        return w.astype("<f4").view(np.uint8), np.full(len(w), 4, dtype=np.int64)
    return np.empty(0, np.uint8), np.zeros(len(w), dtype=np.int64)


def _adjacency_block(srcs: np.ndarray, dsts: np.ndarray, n: int,
                     first_in_chunk: np.ndarray):
    """Encode one [deg, nbrs...]-per-node block; returns (bytes,
    per-chunk cumulative byte offsets, per-node degrees, value order)."""
    order = np.lexsort((dsts, srcs))
    s, d = srcs[order], dsts[order]
    degs = np.bincount(s, minlength=n).astype(np.int64) if n else np.zeros(0, np.int64)
    m = len(d)
    vals = np.zeros(n + m, dtype=_U64)
    deg_pos = np.arange(n, dtype=np.int64) + np.concatenate([[0], np.cumsum(degs)[:-1]]) if n else np.zeros(0, np.int64)
    vals[deg_pos] = degs.astype(_U64)
    mask = np.ones(n + m, dtype=bool)
    mask[deg_pos] = False
    vals[mask] = d.astype(_U64)
    data, lens = varint_encode_block(vals)
    byte_at = np.zeros(n + m + 1, dtype=np.int64)
    np.cumsum(lens, out=byte_at[1:])
    # Cumulative encoded size after each chunk = bytes up to the first
    # value of the next chunk's first node.
    chunk_ends = [int(byte_at[deg_pos[first_in_chunk[c + 1]]]) if first_in_chunk[c + 1] < n
                  else int(byte_at[-1]) for c in range(len(first_in_chunk) - 1)]
    return data, np.asarray(chunk_ends, dtype=np.int64), degs, order


def write_networkit_binary(graph: Graph, path: str, chunks: int = 32,
                           weights: str = "auto",
                           edge_ids: DataFrame | None = None,
                           max_bytes: int | None = None) -> None:
    """NetworkitBinaryWriter semantics — always writes nkbg003 (the
    reference writer does the same since v9.1, NetworkitBinaryWriter.hpp
    :44-47).  Driver-side exchange sink under the package byte budget;
    neighbor lists are written sorted (readers are order-insensitive).

    ``edge_ids``: optional (src, dst, eid) DataFrame; sets feature bit 4
    and writes both id blocks.  Undirected lookups are endpoint-set
    keyed like G.edgeId.
    """
    verts = sorted(r["id"] for r in graph.vertices().collect())
    n = (verts[-1] + 1) if verts else 0
    present = np.zeros(n, dtype=np.uint8)
    present[np.asarray(verts, dtype=np.int64)] = 1 if n else 0

    cols = ["src", "dst", "weight"]
    rows_df = graph.edges if graph.directed else graph.symmetrized_edges()
    n_rows = rows_df.count()
    guard_kw = {"max_bytes": max_bytes} if max_bytes is not None else {}
    est = guard_local_collect(n_rows, what="nkbg writer", **guard_kw)
    log_local_tail("nkbg writer", n_rows, est)
    pdf = rows_df.select(*cols).toPandas()
    src = pdf["src"].to_numpy(np.int64)
    dst = pdf["dst"].to_numpy(np.int64)
    wgt = pdf["weight"].to_numpy(np.float64)

    if not graph.directed:
        # Stored half: adjacency keeps v <= u, transpose keeps v >= u
        # (Writer.cpp:223-239); the symmetrized table has both rows of
        # each edge and exactly one row per self-loop.
        adj_m = dst <= src
        tra_m = dst >= src
        a_src, a_dst, a_w = src[adj_m], dst[adj_m], wgt[adj_m]
        t_src, t_dst, t_w = src[tra_m], dst[tra_m], wgt[tra_m]
    else:
        a_src, a_dst, a_w = src, dst, wgt
        t_src, t_dst, t_w = dst, src, wgt  # in-lists: node ← in-neighbor

    if not graph.weighted:
        wfmt = WF_NONE
    elif weights == "auto":
        wfmt = _detect_weight_format(a_w)
    else:
        wfmt = {"none": WF_NONE, "unsigned": WF_VARINT, "signed": WF_SIGNED,
                "double": WF_DOUBLE, "float": WF_FLOAT}[weights]

    id_map = None
    if edge_ids is not None:
        id_rows = edge_ids.select("src", "dst", "eid").collect()
        id_map = {}
        for r in id_rows:
            if graph.directed:
                id_map[(r["src"], r["dst"])] = r["eid"]
            else:
                id_map[(min(r["src"], r["dst"]), max(r["src"], r["dst"]))] = r["eid"]
    indexed = id_map is not None

    chunks = min(chunks, n) if n else 0
    chunks = max(chunks, 1) if n else 1
    per = n // chunks if chunks else 0
    first_in_chunk = np.array([c * per for c in range(chunks)] + [n], dtype=np.int64)

    adj_data, adj_cum, a_degs, a_order = _adjacency_block(a_src, a_dst, n, first_in_chunk)
    tra_data, tra_cum, t_degs, t_order = _adjacency_block(t_src, t_dst, n, first_in_chunk)

    def entry_cum(lens: np.ndarray, degs: np.ndarray) -> np.ndarray:
        """Per-chunk cumulative byte size of an entry-aligned list (weights
        or ids) — entries follow adjacency order, chunk bounds at node
        boundaries."""
        ends = np.cumsum(degs)  # entries up to and including node u
        byte_at = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=byte_at[1:])
        out = []
        for c in range(chunks):
            hi = first_in_chunk[c + 1]
            n_entries = int(ends[hi - 1]) if hi > 0 else 0
            out.append(int(byte_at[n_entries]))
        return np.asarray(out, dtype=np.int64)

    a_w_sorted = a_w[a_order]
    t_w_sorted = t_w[t_order]
    aw_data, aw_lens = _encode_weights(a_w_sorted, wfmt)
    tw_data, tw_lens = _encode_weights(t_w_sorted, wfmt)
    aw_cum = entry_cum(aw_lens, a_degs)
    tw_cum = entry_cum(tw_lens, t_degs)

    if indexed:
        def ids_for(ss, dd, order):
            s2, d2 = ss[order], dd[order]
            if graph.directed:
                return np.array([id_map[(int(a), int(b))] for a, b in zip(s2, d2)], dtype=np.int64)
            return np.array([id_map[(int(min(a, b)), int(max(a, b)))]
                             for a, b in zip(s2, d2)], dtype=np.int64)

        ai = ids_for(a_src, a_dst, a_order)
        # Directed transpose entries are (dst ← src): id of the arc (src, dst).
        ti = ids_for(t_dst, t_src, t_order) if graph.directed else ids_for(t_src, t_dst, t_order)
        ai_data, ai_lens = varint_encode_block(ai.astype(_U64))
        ti_data, ti_lens = varint_encode_block(ti.astype(_U64))
        ai_cum = entry_cum(ai_lens, a_degs)
        ti_cum = entry_cum(ti_lens, t_degs)
    else:
        ai_data = ti_data = np.empty(0, np.uint8)
        ai_cum = ti_cum = np.zeros(chunks, dtype=np.int64)

    features = (int(graph.directed) & 0x1) | ((wfmt << 1) & 0xE) | ((int(indexed) << 4) & 0x10)
    header_size = 96
    off_base = header_size
    off_adj = off_base + n + 8 * (chunks - 1)
    off_transp = off_adj + 8 * (chunks - 1) + 8 + len(adj_data)
    after_transp = off_transp + 8 * (chunks - 1) + 8 + len(tra_data)
    if wfmt != WF_NONE:
        off_w = after_transp
        off_wt = off_w + 8 * (chunks - 1) + len(aw_data)
        after_w = off_wt + 8 * (chunks - 1) + len(tw_data)
    else:
        off_w = off_wt = 0  # offset arrays still written (Writer.cpp:296-301,377,393)
        after_w = after_transp + 8 * (chunks - 1) + 8 * (chunks - 1)
    if indexed:
        off_id = after_w
        off_idt = off_id + 8 * (chunks - 1) + len(ai_data)
    else:
        off_id = off_idt = 0

    with open(path, "wb") as fh:
        fh.write(_MAGIC_V3)
        fh.write(struct.pack("<11Q", 0, features, n, chunks, off_base, off_adj,
                             off_transp, off_w, off_wt, off_id, off_idt))
        fh.write(present.tobytes())
        fh.write(first_in_chunk[1:chunks].astype("<u8").tobytes())
        # Adjacency block.
        fh.write(adj_cum[:-1].astype("<u8").tobytes())
        fh.write(struct.pack("<Q", len(a_dst)))
        fh.write(adj_data.tobytes())
        # Transpose block.
        fh.write(tra_cum[:-1].astype("<u8").tobytes())
        fh.write(struct.pack("<Q", len(t_dst)))
        fh.write(tra_data.tobytes())
        # Weight blocks (offset arrays always present).
        fh.write(aw_cum[:-1].astype("<u8").tobytes())
        fh.write(aw_data.tobytes())
        fh.write(tw_cum[:-1].astype("<u8").tobytes())
        fh.write(tw_data.tobytes())
        # Id blocks (offset arrays always present).
        fh.write(ai_cum[:-1].astype("<u8").tobytes())
        fh.write(ai_data.tobytes())
        fh.write(ti_cum[:-1].astype("<u8").tobytes())
        fh.write(ti_data.tobytes())
