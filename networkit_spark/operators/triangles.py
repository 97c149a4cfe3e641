"""Triangle counting and clustering coefficients via degree-ordered joins.

Reference semantics:
- ClusteringCoefficient::exactGlobal (networkit/cpp/global/
  ClusteringCoefficient.cpp:164-207): per-node triangle count tr(u) counts
  ordered wedges, i.e. each triangle contributes 2 at each corner; global
  coefficient = Σ_u tr(u) / Σ_u deg(u)·(deg(u)-1). Golden fixture: 18/34 on
  the 6-node graph (GlobalGTest.cpp:29-41).
- LocalClusteringCoefficient (networkit/cpp/centrality/
  LocalClusteringCoefficient.cpp:16-94): score[u] = tr(u)/(deg(u)(deg(u)-1));
  its `turbo` mode orients every edge from higher- to lower-degree endpoint
  (tie by id, :25-27) so each triangle is found exactly once, then ×2 —
  exactly the orientation this implementation uses.
- Undirected simple graphs only (no self-loops: LCC ctor throws,
  LocalClusteringCoefficient.cpp:8-13; multi-edges are collapsed first).

Spark plans (both use the same degree orientation, so enumeration work is
bounded by Σ_v C(out(v),2) ≈ m^1.5 — the reference turbo-mode trick; no
hub blow-up on power-law graphs):

- DEFAULT `method="partition"`: hash-space color-triple partitioning —
  one p·m-row edge shuffle into C(p+2,3) subproblems, then wedge
  generation AND closure run partition-locally in numpy inside
  `groupBy().applyInPandas`; no wedge row ever crosses the network.
  Banner above `_replicated_edges` has the full scheme.
- `method="join"` (A/B escape hatch): the classic two-join enumeration
  (wedge self-join on the shared tail + left-semi closure); its closure
  join shuffles the wedge set itself — 35 GiB at RMAT 2^21
  (BENCH_r4_10x.json), which is what the partitioned plan eliminates.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from networkit_spark.graph import Graph


def _oriented_edges(graph: Graph) -> tuple[DataFrame, DataFrame]:
    """Returns (ord_edges(lo, hi), degrees(id, degree)) where every simple
    undirected edge appears once, oriented ascending by (degree, id) —
    LocalClusteringCoefficient.cpp:25-27 orientation."""
    simple = graph.simple_undirected_edges()  # (u < v), deduped, no loops
    deg = (
        simple.select(F.col("u").alias("id"))
        .unionByName(simple.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("degree").alias("deg_u"))
    dv = deg.select(F.col("id").alias("v"), F.col("degree").alias("deg_v"))
    ordered = (
        simple.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("deg_u") < F.col("deg_v"))
                | ((F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))),
                F.col("u"),
            ).otherwise(F.col("v")).alias("lo"),
            F.when(
                (F.col("deg_u") < F.col("deg_v"))
                | ((F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))),
                F.col("v"),
            ).otherwise(F.col("u")).alias("hi"),
        )
    )
    return ordered, deg


def _triangles_join(graph: Graph) -> DataFrame:
    """Join-based enumeration (the pre-r5 plan, kept for A/B and as an
    explicit `method="join"` escape hatch).

    Wedges are pairs of OUT-neighbors of the orientation-minimal vertex
    (o1 ⋈ o2 on the shared tail — a self-join on one reused hash(lo)
    exchange), so the wedge volume is Σ_v C(out(v), 2), the bound the
    degree orientation exists to guarantee (out(v) = #higher-ordered
    neighbors, small even for hubs). The previous a→b→c path formulation
    joined on the wedge's MIDDLE vertex, whose volume is Σ_b in(b)·out(b)
    — in(hub) ≈ deg(hub) on power-law graphs, which blew the wedge
    shuffle past 60 GiB on a 131M-arc RMAT where this form stays
    pair-bounded. Closure is one left-semi join against the id-ordered
    edge set. The residual scale problem: the WEDGE ROWS THEMSELVES are
    shuffled by the closure join (35 GiB at RMAT 2^21 — BENCH_r4_10x),
    which is why `method="partition"` is the default."""
    ordered, _ = _oriented_edges(graph)
    ordered = ordered.persist(StorageLevel.MEMORY_AND_DISK)
    o1 = ordered.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    o2 = ordered.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    wedges = o1.join(o2, "a").filter(F.col("b") < F.col("c"))
    closing = ordered.select(
        F.least("lo", "hi").alias("b"), F.greatest("lo", "hi").alias("c")
    )
    tri = wedges.join(closing, ["b", "c"], "left_semi").select("a", "b", "c")
    return tri


# ------------------------------------------------- partitioned closure
#
# Hash-space (color-triple) triangle partitioning: color every vertex
# into p classes by hash; for each of the C(p+2,3) sorted color triples
# (t1 <= t2 <= t3, repeats allowed) build one subproblem.  Each oriented
# edge {lo,hi} with colors {a,b} is replicated to the p triples
# sort(a, b, w), w = 0..p-1 (all distinct, so EXACTLY p copies — no
# per-edge fan-out beyond p, including monochromatic edges).  Every
# triangle's three edges all land in the subproblem named by the
# triangle's own sorted color multiset — its CANONICAL home — so each
# subproblem enumerates closure entirely partition-locally (numpy CSR
# wedges + sorted-key membership) and keeps only canonically-colored
# triangles: each triangle found exactly once globally.
#
# Why: shuffle volume becomes p·m replicated EDGES instead of the wedge
# count.  At RMAT 2^21 the join plan shuffled 35 GiB of wedges
# (BENCH_r4_10x.json); p=6 replication of the ~17M oriented edges is
# ~0.5 GiB.  Per-subproblem edge count concentrates around 6m/p², so p
# is the memory lever at 100 TB: pick p with 6m/p² × ~32B within
# executor memory, parallelism = C(p+2,3) tasks.  (Classic MapReduce
# triangle partitioning — Suri & Vassilvitskii WWW'11 / PTE KDD'16 —
# re-expressed as one crossJoin + groupBy().applyInPandas.)

_TRI_CHUNK_PAIRS = 1 << 23  # wedge pairs materialized per numpy chunk


def _tri_default_p(spark) -> int:
    """Smallest p giving >= defaultParallelism subproblems (C(p+2,3)),
    clamped to [3, 16]; NKS_TRI_P overrides."""
    env = os.environ.get("NKS_TRI_P")
    if env:
        return max(3, int(env))
    par = spark.sparkContext.defaultParallelism
    p = 3
    while (p + 2) * (p + 1) * p // 6 < 2 * par and p < 16:
        p += 1
    return p


def _replicated_edges(graph: Graph, p: int, seed: int = 0x7161) -> DataFrame:
    """Oriented edges × p replicas, tagged with the sorted color triple
    (t1,t2,t3) of each destination subproblem."""
    ordered, _ = _oriented_edges(graph)
    spark = graph.edges.sparkSession
    w = F.broadcast(spark.range(p).select(F.col("id").cast("int").alias("w")))
    e = ordered.select(
        "lo",
        "hi",
        F.pmod(F.xxhash64("lo", F.lit(seed)), F.lit(p)).cast("int").alias("c_lo"),
        F.pmod(F.xxhash64("hi", F.lit(seed)), F.lit(p)).cast("int").alias("c_hi"),
    )
    t = F.array_sort(F.array("c_lo", "c_hi", "w"))
    return e.crossJoin(w).select(
        "lo", "hi", "c_lo", "c_hi",
        t[0].alias("t1"), t[1].alias("t2"), t[2].alias("t3"),
    )


def _local_triangle_chunks(pdf: pd.DataFrame, triple):
    """Enumerate this subproblem's canonical triangles partition-locally.

    Yields (tail, b, c, verts, skey, side_ab, side_ac, side_bc) numpy
    chunks in LOCAL vertex ids (verts maps back; local order == id
    order, preserving the b < c by-id contract); side_* index into the
    sorted edge-key array skey for edge-score accumulation."""
    lo = pdf["lo"].to_numpy(np.int64)
    hi = pdf["hi"].to_numpy(np.int64)
    if len(lo) == 0:
        return
    c_lo = pdf["c_lo"].to_numpy(np.int64)
    c_hi = pdf["c_hi"].to_numpy(np.int64)
    verts = np.unique(np.concatenate([lo, hi]))
    l = np.searchsorted(verts, lo)
    h = np.searchsorted(verts, hi)
    col = np.empty(len(verts), dtype=np.int64)
    col[l] = c_lo
    col[h] = c_hi
    # membership structure: sorted packed {min,max} local-id pair keys
    ekey = (np.minimum(l, h).astype(np.int64) << 32) | np.maximum(l, h)
    skey = np.sort(ekey)
    # group edges by tail (orientation-minimal endpoint)
    order = np.argsort(l, kind="stable")
    lt, ht = l[order], h[order]
    _, start_idx, counts = np.unique(lt, return_index=True, return_counts=True)
    pos = np.arange(len(lt)) - np.repeat(start_idx, counts)
    first_count = np.repeat(counts, counts) - pos - 1  # pairs led by each edge
    cum = np.concatenate([[0], np.cumsum(first_count)])
    t0, t1, t2 = int(triple[0]), int(triple[1]), int(triple[2])
    e_start = 0
    n_edges = len(lt)
    while e_start < n_edges:
        e_end = int(np.searchsorted(
            cum, cum[e_start] + _TRI_CHUNK_PAIRS, side="right")) - 1
        e_end = min(max(e_end, e_start + 1), n_edges)
        fc = first_count[e_start:e_end]
        n_pairs = int(cum[e_end] - cum[e_start])
        if n_pairs == 0:
            e_start = e_end
            continue
        a_idx = np.repeat(np.arange(e_start, e_end), fc)
        boff = np.arange(n_pairs) - np.repeat(cum[e_start:e_end] - cum[e_start], fc)
        b_idx = a_idx + 1 + boff
        tail = lt[a_idx]
        x, y = ht[a_idx], ht[b_idx]
        bb = np.minimum(x, y)
        cc = np.maximum(x, y)
        # canonical-color filter: triangle counted only in its home triple
        c3 = np.sort(np.stack([col[tail], col[bb], col[cc]]), axis=0)
        keep = (c3[0] == t0) & (c3[1] == t1) & (c3[2] == t2)
        tail, bb, cc = tail[keep], bb[keep], cc[keep]
        # closure: {bb,cc} must be an edge of the subproblem
        pk = (bb << 32) | cc
        idx = np.searchsorted(skey, pk)
        np.minimum(idx, len(skey) - 1, out=idx)
        closed = skey[idx] == pk
        tail, bb, cc, idx = tail[closed], bb[closed], cc[closed], idx[closed]
        ab = np.searchsorted(skey, (np.minimum(tail, bb) << 32) | np.maximum(tail, bb))
        ac = np.searchsorted(skey, (np.minimum(tail, cc) << 32) | np.maximum(tail, cc))
        yield tail, bb, cc, verts, skey, ab, ac, idx
        e_start = e_end


def _tri_kernel(key, pdf):
    a_out, b_out, c_out = [], [], []
    for tail, bb, cc, verts, _, _, _, _ in _local_triangle_chunks(pdf, key):
        a_out.append(verts[tail])
        b_out.append(verts[bb])
        c_out.append(verts[cc])
    if not a_out:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "c": pd.Series(dtype="int64")})
    return pd.DataFrame({"a": np.concatenate(a_out),
                         "b": np.concatenate(b_out),
                         "c": np.concatenate(c_out)})


def _total_kernel(key, pdf):
    n = 0
    for tail, _, _, _, _, _, _, _ in _local_triangle_chunks(pdf, key):
        n += len(tail)
    return pd.DataFrame({"cnt": np.array([n], dtype=np.int64)})


def _corner_kernel(key, pdf):
    acc = None
    verts = None
    for tail, bb, cc, v, _, _, _, _ in _local_triangle_chunks(pdf, key):
        if acc is None:
            acc = np.zeros(len(v), dtype=np.int64)
            verts = v
        np.add.at(acc, tail, 1)
        np.add.at(acc, bb, 1)
        np.add.at(acc, cc, 1)
    if acc is None:
        return pd.DataFrame({"id": pd.Series(dtype="int64"),
                             "cnt": pd.Series(dtype="int64")})
    nz = np.flatnonzero(acc)
    return pd.DataFrame({"id": verts[nz], "cnt": acc[nz]})


def _edge_kernel(key, pdf):
    acc = None
    verts = skey = None
    for tail, _, _, v, sk, ab, ac, bc in _local_triangle_chunks(pdf, key):
        if acc is None:
            acc = np.zeros(len(sk), dtype=np.int64)
            verts, skey = v, sk
        np.add.at(acc, ab, 1)
        np.add.at(acc, ac, 1)
        np.add.at(acc, bc, 1)
    if acc is None:
        return pd.DataFrame({"u": pd.Series(dtype="int64"),
                             "v": pd.Series(dtype="int64"),
                             "cnt": pd.Series(dtype="int64")})
    nz = np.flatnonzero(acc)
    keys = skey[nz]
    return pd.DataFrame({"u": verts[keys >> 32],
                         "v": verts[keys & 0xFFFFFFFF],
                         "cnt": acc[nz]})


def _partitioned(graph: Graph, kernel, schema: str, p: int | None) -> DataFrame:
    if p is None:
        p = _tri_default_p(graph.edges.sparkSession)
    rep = _replicated_edges(graph, p)
    return rep.groupBy("t1", "t2", "t3").applyInPandas(kernel, schema)


def _resolve_method(method: str | None) -> str:
    if method is None:
        method = os.environ.get("NKS_TRI_METHOD", "partition")
    if method not in ("partition", "join"):
        raise ValueError(f"unknown triangle method {method!r}")
    return method


def triangles(graph: Graph, method: str | None = None,
              p: int | None = None) -> DataFrame:
    """All triangles, once each, as (a, b, c): a is the triangle's
    orientation-minimal vertex ((degree, id) order), b < c by id.

    Default plan is the partition-local color-triple closure (see module
    banner above `_replicated_edges`): one p·m-row shuffle, then each
    subproblem enumerates its wedges and closure in numpy with zero
    further exchange.  `method="join"` (or NKS_TRI_METHOD=join) selects
    the distributed two-join plan whose closure shuffles the wedge set
    itself — label-identical output, kept for A/B."""
    if _resolve_method(method) == "join":
        return _triangles_join(graph)
    return _partitioned(graph, _tri_kernel, "a long, b long, c long", p)


def triangle_counts(graph: Graph, method: str | None = None,
                    p: int | None = None) -> DataFrame:
    """(id, triangles) — triangles incident to each vertex, each counted ONCE
    (reference tr(u) = 2 × this; every vertex present, 0 if none).

    Partitioned path: each subproblem emits per-vertex PARTIAL counts
    (bincount over its canonical triangles' corners, ≤ its local vertex
    count in rows) — the global agg shuffles vertex-bounded partials,
    never per-triangle rows."""
    if _resolve_method(method) == "join":
        tri = _triangles_join(graph)
        corners = (
            tri.select(F.col("a").alias("id"))
            .unionByName(tri.select(F.col("b").alias("id")))
            .unionByName(tri.select(F.col("c").alias("id")))
        )
        cnt = corners.groupBy("id").agg(F.count("*").alias("triangles"))
    else:
        partial = _partitioned(graph, _corner_kernel, "id long, cnt long", p)
        cnt = partial.groupBy("id").agg(F.sum("cnt").alias("triangles"))
    return (
        graph.vertices()
        .join(cnt, "id", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"))
    )


def total_triangles(graph: Graph, method: str | None = None,
                    p: int | None = None) -> int:
    """Total number of distinct triangles in the graph.  Partitioned
    path reduces ONE long per subproblem — no per-triangle rows cross
    the Python/JVM boundary at all."""
    if _resolve_method(method) == "join":
        return _triangles_join(graph).count()
    part = _partitioned(graph, _total_kernel, "cnt long", p)
    return int(part.agg(F.sum("cnt")).first()[0] or 0)


def global_clustering_coefficient(graph: Graph) -> float:
    """exactGlobal (ClusteringCoefficient.cpp:195-206):
    Σ_u 2·tri(u) / Σ_u deg(u)·(deg(u)-1). 18/34 on the golden fixture."""
    ordered, deg = _oriented_edges(graph)
    tri = triangle_counts(graph)
    num = tri.agg(F.sum(F.col("triangles") * 2)).first()[0] or 0
    den = deg.agg(F.sum(F.col("degree") * (F.col("degree") - 1))).first()[0] or 0
    if den == 0:
        return 0.0
    return num / den


def triangle_edge_scores(graph: Graph, method: str | None = None,
                         p: int | None = None) -> DataFrame:
    """(u, v, triangles) — triangles containing each simple undirected
    edge {u,v} (u < v). Reference: TriangleEdgeScore
    (networkit/cpp/edgescores/TriangleEdgeScore.cpp:18-120); same
    degree-ordered enumeration, scores scattered back to the three edges
    of each triangle. Every edge present, 0 when in no triangle.
    Partitioned path emits per-EDGE partial counts (edge-bounded, never
    per-triangle rows)."""
    if _resolve_method(method) == "join":
        tri = _triangles_join(graph)
        sides = (
            tri.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
            .unionByName(tri.select(F.least("b", "c").alias("u"), F.greatest("b", "c").alias("v")))
            .unionByName(tri.select(F.least("a", "c").alias("u"), F.greatest("a", "c").alias("v")))
        )
        cnt = sides.groupBy("u", "v").agg(F.count("*").alias("triangles"))
    else:
        partial = _partitioned(graph, _edge_kernel, "u long, v long, cnt long", p)
        cnt = partial.groupBy("u", "v").agg(F.sum("cnt").alias("triangles"))
    return (
        graph.simple_undirected_edges()
        .join(cnt, ["u", "v"], "left")
        .select("u", "v", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"))
    )


def approx_global_clustering_coefficient(graph: Graph, n_samples: int = 10000,
                                         seed: int = 42) -> float:
    """Wedge-sampling estimator (ClusteringCoefficient::approxGlobal,
    networkit/cpp/global/ClusteringCoefficient.cpp:209-270): sample
    wedges proportionally to deg·(deg-1) per pivot, test closure; the
    closed fraction estimates the global coefficient.

    Deterministic: pivots drawn by hashing the sample index against the
    cumulative wedge-count distribution; wedge endpoints drawn by hashed
    index into the pivot's (sorted) adjacency — no RNG state, executors
    regenerate their samples independently."""
    simple = graph.simple_undirected_edges()
    adj = (
        simple.select(F.col("u").alias("id"), F.col("v").alias("nbr"))
        .unionByName(simple.select(F.col("v").alias("id"), F.col("u").alias("nbr")))
    )
    # adjacency arrays + per-pivot wedge counts
    nbrs = adj.groupBy("id").agg(F.sort_array(F.collect_list("nbr")).alias("nbrs"))
    nbrs = nbrs.withColumn("deg", F.size("nbrs")).filter(F.col("deg") >= 2)
    nbrs = nbrs.withColumn("wedges", (F.col("deg") * (F.col("deg") - 1) / 2).cast("long"))
    from networkit_spark.plans.ranking import global_prefix_sums

    # NB: named cum_off, not "offset" — DataFrame.offset() is a method in
    # pyspark 4 and attribute access would resolve to it, not the column.
    # Two-phase exclusive prefix sum (plans/ranking.py) — no global window.
    cum = global_prefix_sums(nbrs, "id", "wedges", out_col="cum_off")
    total_wedges = cum.agg(F.sum("wedges")).first()[0] or 0
    if total_wedges == 0:
        return 0.0

    spark = graph.edges.sparkSession
    samples = spark.range(n_samples).select(
        (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(total_wedges))).alias("widx"),
        F.col("id").alias("sample_id"),
    )
    # pivot = the vertex whose cumulative wedge range contains widx
    picked = samples.join(
        cum,
        (samples.widx >= cum.cum_off) & (samples.widx < cum.cum_off + cum.wedges),
    )
    # unrank wedge (i, j) within the pivot: i < j over deg neighbors
    picked = picked.select(
        "sample_id",
        "nbrs",
        "deg",
        (F.col("widx") - F.col("cum_off")).alias("k"),
    )
    # linear unranking: i = floor(((2d-1) - sqrt((2d-1)^2 - 8k)) / 2)
    d = F.col("deg").cast("double")
    k = F.col("k").cast("double")
    i = F.floor(((2 * d - 1) - F.sqrt((2 * d - 1) * (2 * d - 1) - 8 * k)) / 2)
    j = (F.col("k") - i * (2 * d - i - 1) / 2 + i + 1).cast("long")
    wedge = picked.select(
        "sample_id",
        F.element_at("nbrs", (i + 1).cast("int")).alias("x"),
        F.element_at("nbrs", (j + 1).cast("int")).alias("y"),
    )
    closed = wedge.join(
        simple,
        (F.least("x", "y") == F.col("u")) & (F.greatest("x", "y") == F.col("v")),
        "left_semi",
    ).count()
    return closed / n_samples


def extract_largest_connected_component(graph: Graph, compact: bool = False) -> Graph:
    """ConnectedComponents::extractLargestConnectedComponent
    (ConnectedComponentsImpl.cpp:71-95): induced subgraph on the biggest
    component; compact=True relabels ids to 0..n-1."""
    from networkit_spark.graphtools import compact_graph, subgraph_from_nodes
    from networkit_spark.operators.components import connected_components

    res = connected_components(graph)
    top = (
        res.component_sizes().orderBy(F.desc("size"), F.asc("label")).limit(1)
        .select("label")
    )
    members = res.labels.join(F.broadcast(top), "label").select("id")
    sub = subgraph_from_nodes(graph, members)
    return compact_graph(sub) if compact else sub


def local_clustering_coefficients(graph: Graph, turbo: bool = True) -> DataFrame:
    """(id, score) — LocalClusteringCoefficient.cpp:82: score[u] =
    2·tri(u) / (deg(u)·(deg(u)-1)); 0 when deg < 2. (`turbo` kept for API
    parity — this plan IS the turbo orientation.)"""
    _, deg = _oriented_edges(graph)
    tri = triangle_counts(graph)
    return (
        graph.vertices()
        .join(deg, "id", "left")
        .join(tri, "id", "left")
        .select(
            "id",
            F.when(
                F.coalesce("degree", F.lit(0)) >= 2,
                2.0
                * F.coalesce("triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
            )
            .otherwise(0.0)
            .alias("score"),
        )
    )
