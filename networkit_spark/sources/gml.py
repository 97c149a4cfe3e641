"""GML reader/writer + format-sniffing read_graph dispatcher.

Reference: networkit/cpp/io/GMLGraphReader.cpp:21-186 and
graphio.pyx `readGraph`/`guessFileFormat` (networkit/graphio.pyx:
1130-1179). Semantics reproduced:

- nodes are assigned CONSECUTIVE internal ids 0..n-1 in FILE ORDER of
  their `node [ ... ]` blocks; the GML `id` value is only the key used
  to resolve edge endpoints (GMLGraphReader.cpp:60-72 addNode +
  nodeMap);
- `directed 1` before the first node block makes the graph directed
  (GMLGraphReader.cpp:137-141);
- edges resolve `source`/`target` through the node map; an edge already
  present is skipped with a warning (addEdge(..., checkMultiEdge=true),
  GMLGraphReader.cpp:108-111) — for undirected graphs the reverse
  orientation counts as present;
- node/edge attributes beyond id/source/target are ignored (stated in
  the reference code comments).

Scale note: GML is a sequential nested-block text format for
small/medium exchange graphs (the reference's own test fixtures) — the
PARSE is driver-side by design; the resulting edge table is a normal
distributed DataFrame. Web-scale ingest uses the parquet/edge-list/
pages paths.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

from networkit_spark.graph import Graph

_BLOCK_RE = re.compile(r"\b(node|edge)\s*\[(.*?)\]", re.DOTALL)
_KV_RE = re.compile(r"(\w+)\s+(\"[^\"]*\"|\S+)")


def _parse_gml(text: str):
    """(directed, node_gml_ids_in_file_order, edges_as_gml_id_pairs)."""
    m = re.search(r"\bgraph\s*\[", text)
    if not m:
        raise ValueError("not a GML file: no 'graph [' block")
    body = text[m.end():]
    first_block = _BLOCK_RE.search(body)
    header = body[: first_block.start()] if first_block else body
    directed = bool(re.search(r"\bdirected\s+1\b", header))

    nodes: list[str] = []
    edges: list[tuple[str, str]] = []
    for kind, blob in _BLOCK_RE.findall(body):
        kv = dict(_KV_RE.findall(blob))
        if kind == "node":
            if "id" in kv:
                nodes.append(kv["id"])
        else:
            if "source" in kv and "target" in kv:
                edges.append((kv["source"], kv["target"]))
    return directed, nodes, edges


def read_gml(spark: SparkSession, path: str) -> Graph:
    """GMLGraphReader.read parity (see module docstring)."""
    with open(path, encoding="utf-8") as fh:
        directed, gml_nodes, gml_edges = _parse_gml(fh.read())

    node_map = {gid: i for i, gid in enumerate(gml_nodes)}
    seen: set[tuple[int, int]] = set()
    pairs: list[tuple[int, int, float]] = []
    for s, t in gml_edges:
        u, v = node_map[s], node_map[t]
        key = (u, v) if directed else (min(u, v), max(u, v))
        if key in seen:
            continue  # reference warns + skips duplicate edges
        seen.add(key)
        pairs.append((u, v, 1.0))

    edges = spark.createDataFrame(
        pairs or [], "src long, dst long, weight double"
    )
    vertices = spark.createDataFrame(
        [(i,) for i in range(len(gml_nodes))], "id long"
    )
    return Graph.from_edges(edges, directed=directed, vertices=vertices)


def write_gml(graph: Graph, path: str) -> None:
    """GMLGraphWriter parity: nodes 0..n-1 in id order, one edge block
    per (stored) edge. Driver-side serialization — GML is an exchange
    format, not a scale sink."""
    node_ids = sorted(r["id"] for r in graph.vertices().collect())
    idx = {nid: i for i, nid in enumerate(node_ids)}
    if graph.directed:
        arcs = [(r["src"], r["dst"]) for r in graph.edges.select("src", "dst").collect()]
    else:
        arcs = sorted(
            {
                (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
                for r in graph.edges.select("src", "dst").collect()
            }
        )
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("graph [\n")
        if graph.directed:
            fh.write("  directed 1\n")
        for nid in node_ids:
            fh.write(f"  node [\n    id {idx[nid]}\n  ]\n")
        for u, v in arcs:
            fh.write(f"  edge [\n    source {idx[u]}\n    target {idx[v]}\n  ]\n")
        fh.write("]\n")


def read_graph(spark: SparkSession, path: str, **kwargs) -> Graph:
    """Format-sniffing dispatcher (graphio.pyx readGraph/guessFileFormat
    parity for the formats this engine ships): extension first, then a
    content peek — 'graph [' → GML; a 2-3-integer header line → METIS;
    '#'-commented integer pairs → SNAP/edge list; otherwise the
    separator-sniffing edge-list reader."""
    from networkit_spark.sources.edgelist import (
        read_edge_list,
        read_metis,
        read_snap,
    )

    from networkit_spark.sources.graphml import read_graphml
    from networkit_spark.sources.mtx import _looks_like_mtx, read_mtx

    from networkit_spark.sources.gexf import read_gexf

    ext = os.path.splitext(path)[1].lower()
    if ext == ".gml":
        return read_gml(spark, path)
    if ext == ".graphml":
        return read_graphml(spark, path)
    if ext == ".gexf":
        return read_gexf(spark, path)
    if ext == ".mtx":
        return read_mtx(spark, path)
    if ext in (".graph", ".metis"):
        return read_metis(spark, path)
    if ext.startswith(".nkbg"):
        from networkit_spark.sources.nkbg import read_networkit_binary

        return read_networkit_binary(spark, path)

    # Binary magic peek before any text decode (nkbg files are binary).
    with open(path, "rb") as fh:
        if fh.read(4) == b"nkbg":
            from networkit_spark.sources.nkbg import read_networkit_binary

            return read_networkit_binary(spark, path)

    with open(path, encoding="utf-8", errors="replace") as fh:
        head = [line for line in (fh.readline() for _ in range(50)) if line]
    stripped = [ln.strip() for ln in head if ln.strip()]
    # MatrixMarket banner beats the generic '%'-comment handling
    # (guessFileFormat checks the banner first)
    if stripped and _looks_like_mtx(stripped[0]):
        return read_mtx(spark, path)
    if any(ln.startswith("<graphml") for ln in stripped[:5]):
        # reference sniff: XML base element <graphml (graphio.pyx:1180)
        return read_graphml(spark, path)
    if any(ln.startswith("<gexf") for ln in stripped[:5]):
        return read_gexf(spark, path)
    if any(ln.startswith("graph") and "[" in ln for ln in stripped[:5]):
        return read_gml(spark, path)
    first_real = next((ln for ln in stripped if not ln.startswith(("%", "#"))), "")
    toks = first_real.split()
    if (
        2 <= len(toks) <= 3
        and all(t.isdigit() for t in toks)
        and len(stripped) > 1
        and not any(ln.startswith("#") for ln in stripped)
        and int(toks[0]) > 2
    ):
        # METIS header: <n> <m> [fmt] — ambiguous vs a 2-column edge
        # list only for degenerate tiny graphs; the reference resolves
        # the same way (guessFileFormat peeks the header shape).
        second = stripped[1].split()
        if len(second) != 2 or ext == ".graph":
            return read_metis(spark, path)
    if any(ln.startswith("#") for ln in stripped):
        return read_snap(spark, path, **kwargs)
    return read_edge_list(spark, path, **kwargs)
