"""GraphTools — graph transforms as single DataFrame expressions.

Reference surface: include/networkit/graph/GraphTools.hpp /
networkit/cpp/graph/GraphTools.cpp (Python networkit/graphtools.pyx:48-717).
Each transform is a projection/join/union — Catalyst prunes and pushes
down; none iterate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph


def to_undirected(graph: Graph) -> Graph:
    """GraphTools::toUndirected (GraphTools.hpp:302)."""
    if not graph.directed:
        return graph
    return Graph(
        edges=graph.symmetrized_edges(),
        directed=False,
        weighted=graph.weighted,
        _vertices=graph._vertices,
        num_partitions=graph.num_partitions,
    )


def to_unweighted(graph: Graph) -> Graph:
    """GraphTools::toUnweighted (GraphTools.hpp:311)."""
    return Graph(
        edges=graph.edges.select("src", "dst", F.lit(1.0).alias("weight")),
        directed=graph.directed,
        weighted=False,
        _vertices=graph._vertices,
        num_partitions=graph.num_partitions,
    )


def transpose(graph: Graph) -> Graph:
    """GraphTools::transpose (GraphTools.hpp:329) — directed only."""
    if not graph.directed:
        raise ValueError("transpose is defined for directed graphs")
    return Graph(
        edges=graph.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        ),
        directed=True,
        weighted=graph.weighted,
        _vertices=graph._vertices,
        num_partitions=graph.num_partitions,
    )


def subgraph_from_nodes(graph: Graph, nodes: DataFrame) -> Graph:
    """GraphTools::subgraphFromNodes (GraphTools.hpp:207-291) — induced
    subgraph: both endpoints must be in the node set (double semi-join)."""
    ids = nodes.select(F.col("id").cast("long").alias("id")).distinct()
    e = (
        graph.edges.join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .select("src", "dst", "weight")
    )
    v = graph.vertices().join(ids, "id", "left_semi")
    return Graph(
        edges=e,
        directed=graph.directed,
        weighted=graph.weighted,
        _vertices=v,
        num_partitions=graph.num_partitions,
    )


def append_graph(a: Graph, b: Graph) -> Graph:
    """GraphTools::append (GraphTools.hpp:337) — disjoint union; b's ids
    are shifted above a's max id (reference offsets by upperNodeIdBound)."""
    offset = (a.vertices().agg(F.max("id")).first()[0] or 0) + 1
    b_edges = b.edges.select(
        (F.col("src") + offset).alias("src"),
        (F.col("dst") + offset).alias("dst"),
        "weight",
    )
    b_vertices = b.vertices().select((F.col("id") + offset).alias("id"))
    return Graph(
        edges=a.edges.unionByName(b_edges),
        directed=a.directed,
        weighted=a.weighted or b.weighted,
        _vertices=a.vertices().unionByName(b_vertices),
        num_partitions=a.num_partitions,
    )


def merge_graph(a: Graph, b: Graph) -> Graph:
    """GraphTools::merge (GraphTools.hpp:346) — union on the SAME id space."""
    return Graph(
        edges=a.edges.unionByName(b.edges).dropDuplicates(["src", "dst"]),
        directed=a.directed,
        weighted=a.weighted or b.weighted,
        _vertices=a.vertices().unionByName(b.vertices()).distinct(),
        num_partitions=a.num_partitions,
    )


def continuous_node_ids(graph: Graph) -> DataFrame:
    """GraphTools::getContinuousNodeIds (GraphTools.hpp:361) —
    (id, compact_id) with compact ids 0..n-1 in ascending id order.
    Two-phase rank (plans/ranking.py) — the canonical-relabel harness
    must not funnel the vertex set through one task."""
    from networkit_spark.plans.ranking import global_row_numbers

    return global_row_numbers(graph.vertices(), "id", "compact_id")


def compact_graph(graph: Graph) -> Graph:
    """GraphTools::getCompactedGraph (GraphTools.hpp:354)."""
    mapping = continuous_node_ids(graph)
    msrc = mapping.select(F.col("id").alias("src"), F.col("compact_id").alias("new_src"))
    mdst = mapping.select(F.col("id").alias("dst"), F.col("compact_id").alias("new_dst"))
    e = (
        graph.edges.join(msrc, "src")
        .join(mdst, "dst")
        .select(
            F.col("new_src").alias("src"), F.col("new_dst").alias("dst"), "weight"
        )
    )
    v = mapping.select(F.col("compact_id").alias("id"))
    return Graph(
        edges=e,
        directed=graph.directed,
        weighted=graph.weighted,
        _vertices=v,
        num_partitions=graph.num_partitions,
    )


def density(graph: Graph) -> float:
    """GraphTools::density (GraphTools.hpp:131) — m / (n·(n−1)), undirected
    counts each edge once in m but the denominator halves."""
    n = graph.num_vertices()
    m = graph.num_edges()
    if n < 2:
        return 0.0
    denom = n * (n - 1) if graph.directed else n * (n - 1) / 2
    return m / denom


def volume(graph: Graph) -> float:
    """GraphTools::volume — Σ weightedDegree (undirected: 2·Σw)."""
    total = graph.edges.agg(F.sum("weight")).first()[0] or 0.0
    return float(total)


def max_degree(graph: Graph) -> int:
    """GraphTools::maxDegree (GraphTools.hpp:23)."""
    row = graph.out_degrees().agg(F.max("degree")).first()
    return int(row[0] or 0)


def max_weighted_degree(graph: Graph) -> float:
    row = graph.out_degrees().agg(F.max("w_degree")).first()
    return float(row[0] or 0.0)


def random_node(graph: Graph, seed: int = 42) -> int:
    """Seeded uniform random node (GraphTools.hpp:55) — test utility."""
    row = graph.vertices().orderBy(F.xxhash64(F.col("id"), F.lit(seed))).first()
    return int(row["id"])


def index_edges(graph: Graph) -> DataFrame:
    """(src, dst, eid) — consecutive 0-based edge ids for every stored
    edge (undirected edges get ONE id, mirrored to both orientations).

    Reference: Graph::indexEdges (graph/Graph.cpp) assigns ids in
    adjacency order — an artifact of the CSR layout; the contract
    callers rely on is only CONSECUTIVE + STABLE. The Spark-first
    substitute ranks the canonical edge set by xxhash64(src, dst) with
    the two-phase global ranking plan (plans/ranking.py — no
    single-partition window). Deterministic for a given edge set; the
    hash order is documented as the assignment order.
    """
    from networkit_spark.plans.ranking import global_row_numbers

    if graph.directed:
        canon = graph.edges.select("src", "dst")
    else:
        canon = graph.simple_undirected_edges().select(
            F.col("u").alias("src"), F.col("v").alias("dst")
        )
    keyed = canon.withColumn("h", F.xxhash64("src", "dst"))
    ranked = global_row_numbers(keyed, "h", out_col="eid").select(
        "src", "dst", "eid"
    )
    if not graph.directed:
        ranked = ranked.unionByName(
            ranked.filter(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "eid"
            )
        )
    return ranked


def edge_id(graph: Graph, u: int, v: int) -> int | None:
    """edgeId(u, v) (Graph.hpp edgeId) — None when absent."""
    row = (
        index_edges(graph)
        .filter((F.col("src") == u) & (F.col("dst") == v))
        .first()
    )
    return int(row["eid"]) if row else None
