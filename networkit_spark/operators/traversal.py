"""Single-source traversals as iterative frontier programs.

Reference surface: Traversal.BFSfrom/DijkstraFrom callbacks
(networkit/traversal.pyx:76-111, include/networkit/graph/BFS.hpp) and the
BFS inside ConnectedComponents (ConnectedComponentsImpl.cpp:23-68).
The Spark translation (SURVEY.md §2.4): BFS = repeated frontier
semi-join; Dijkstra's priority queue has no distributed analog, so
weighted SSSP is Bellman-Ford-style relaxation (same fixed point,
O(longest-shortest-path-hops) supersteps) — the standard Pregel SSSP.

Also here: isBipartite (2-coloring from BFS parity) and topologicalSort
(distributed Kahn peeling) — GraphTools.hpp:423-438,574.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from networkit_spark.graph import Graph
from networkit_spark.plans.iterative import Checkpointer, truncate


def bfs_distances(graph: Graph, source: int, max_iterations: int | None = None) -> DataFrame:
    """(id, distance) hop counts from source; unreachable vertices are
    absent (reference marks them none/infinity)."""
    spark = graph.edges.sparkSession
    ckpt = Checkpointer(spark, None, algorithm="bfs")
    sym = graph.edges.select("src", "dst")
    if not graph.directed:
        sym = graph.symmetrized_edges().select("src", "dst")
    sym = sym.persist(StorageLevel.MEMORY_AND_DISK)

    visited = spark.createDataFrame([(source, 0)], "id long, distance long")
    frontier = visited
    depth = 0
    while max_iterations is None or depth < max_iterations:
        depth += 1
        nxt = (
            frontier.join(sym, frontier.id == sym.src)
            .select(F.col("dst").alias("id"), F.lit(depth).cast("long").alias("distance"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
        )
        nxt = ckpt.save(nxt, depth, None)
        if nxt.limit(1).count() == 0:
            break
        visited = truncate(visited.unionByName(nxt), release=visited)
        frontier = nxt
    sym.unpersist()
    ckpt.close()
    return visited


def shortest_paths(graph: Graph, source: int,
                   max_iterations: int | None = None) -> DataFrame:
    """(id, distance) weighted shortest-path distances from source —
    Bellman-Ford relaxation loop (DijkstraFrom parity at the fixed point;
    requires non-negative weights like the reference's Dijkstra)."""
    spark = graph.edges.sparkSession
    ckpt = Checkpointer(spark, None, algorithm="sssp")
    edges = graph.symmetrized_edges() if not graph.directed else graph.edges
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)

    dist = spark.createDataFrame([(source, 0.0)], "id long, distance double")
    changed, it = 1, 0
    while changed and (max_iterations is None or it < max_iterations):
        it += 1
        relaxed = (
            dist.join(edges, dist.id == edges.src)
            .select(F.col("dst").alias("id"),
                    (F.col("distance") + F.col("weight")).alias("distance"))
        )
        new = (
            dist.unionByName(relaxed)
            .groupBy("id")
            .agg(F.min("distance").alias("distance"))
        )
        merged = new.join(
            dist.withColumnRenamed("distance", "old"), "id", "left"
        ).select(
            "id", "distance",
            (F.col("old").isNull() | (F.col("distance") < F.col("old"))).alias("improved"),
        )
        snap = ckpt.save(merged, it, None)
        changed = snap.filter("improved").limit(1).count()
        dist = snap.select("id", "distance")
    edges.unpersist()
    ckpt.close()
    return dist


def is_bipartite(graph: Graph) -> bool:
    """GraphTools::isBipartite (GraphTools.hpp:574): 2-colorable ⇔ no
    edge joins two vertices of equal BFS parity. Runs one BFS per
    component via the hash-min component structure: color = parity of
    distance from the component's min-id vertex."""
    from networkit_spark.operators.components import connected_components

    comps = connected_components(graph).labels  # (id, label=min id of comp)
    sym = graph.symmetrized_edges().select("src", "dst")

    # multi-source BFS: all component roots at distance 0 simultaneously
    spark = graph.edges.sparkSession
    ckpt = Checkpointer(spark, None, algorithm="bipartite")
    visited = comps.filter(F.col("id") == F.col("label")).select(
        "id", F.lit(0).cast("long").alias("parity")
    )
    frontier = visited
    depth = 0
    while True:
        depth += 1
        nxt = (
            frontier.join(sym, frontier.id == sym.src)
            .select(F.col("dst").alias("id"),
                    F.lit(depth % 2).cast("long").alias("parity"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .dropDuplicates(["id"])  # reachable at both parities → pick one; the edge check below catches the conflict
        )
        nxt = ckpt.save(nxt, depth, None)
        if nxt.limit(1).count() == 0:
            break
        visited = truncate(visited.unionByName(nxt), release=visited)
        frontier = nxt
    pu = visited.select(F.col("id").alias("src"), F.col("parity").alias("pu"))
    pv = visited.select(F.col("id").alias("dst"), F.col("parity").alias("pv"))
    bad = (
        sym.filter(F.col("src") != F.col("dst"))
        .join(pu, "src").join(pv, "dst")
        .filter(F.col("pu") == F.col("pv"))
        .limit(1)
        .count()
    )
    has_loop = graph.number_of_self_loops() > 0
    ckpt.close()
    return bad == 0 and not has_loop


def topological_sort(graph: Graph) -> DataFrame:
    """GraphTools::topologicalSort (GraphTools.hpp:423-438) — distributed
    Kahn peeling: (id, level) where every edge goes from a lower to a
    higher level; raises on cycles. Any linearization of levels (level
    asc, id asc) is a valid topological order."""
    if not graph.directed:
        raise ValueError("topologicalSort requires a directed graph")
    spark = graph.edges.sparkSession
    ckpt = Checkpointer(spark, None, algorithm="toposort")
    edges = graph.edges.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    remaining_v = graph.vertices()
    remaining_e = edges
    out = None
    level = 0
    while True:
        with_in = remaining_e.select(F.col("dst").alias("id")).distinct()
        zero_in = remaining_v.join(with_in, "id", "left_anti").withColumn(
            "level", F.lit(level).cast("long")
        )
        zero_in = ckpt.save(zero_in, level + 1, None)
        n_zero = zero_in.count()
        if n_zero == 0:
            if remaining_v.limit(1).count() > 0:
                edges.unpersist()
                raise ValueError("graph has a cycle — no topological order")
            break
        out = zero_in if out is None else out.unionByName(zero_in)
        remaining_v = remaining_v.join(zero_in.select("id"), "id", "left_anti")
        remaining_e = truncate(
            remaining_e.join(
                zero_in.select(F.col("id").alias("src")), "src", "left_anti"
            ),
            release=remaining_e,
        )
        level += 1
    edges.unpersist()
    ckpt.close()
    return out if out is not None else graph.vertices().withColumn(
        "level", F.lit(0).cast("long")
    )


def dfs_from(graph: Graph, source: int, max_local_nodes: int = 5_000_000) -> DataFrame:
    """(id, dfs_order) — depth-first visit order from `source`, exactly
    Traversal::DFSfrom (include/networkit/graph/DFS.hpp:20-38): stack
    of discovered-but-unvisited nodes, a node is MARKED WHEN PUSHED, and
    neighbors are pushed in ascending id order (this engine's canonical
    adjacency order; the reference uses insertion order, which its own
    callers never rely on).

    Physical note: DFS order is P-complete — no distributed formulation
    exists (SURVEY.md §2.4 scopes it out of the kernel set; the
    reference uses it only for driver-side callbacks). The distributed
    half here is confining the work to the REACHABLE component (frontier
    BFS + adjacency collect of that component only); the stack replay is
    driver-local and guarded by `max_local_nodes`.
    """
    reach = bfs_distances(graph, source).select("id")
    n_reach = reach.count()
    if n_reach > max_local_nodes:
        raise ValueError(
            f"reachable component has {n_reach} nodes > max_local_nodes="
            f"{max_local_nodes}; DFS order is inherently sequential"
        )
    sym = graph.edges if graph.directed else graph.symmetrized_edges()
    adj_rows = (
        sym.join(reach.withColumnRenamed("id", "src"), "src")
        .select("src", "dst")
        .distinct()
        .collect()
    )
    adj: dict[int, list[int]] = {}
    for r in adj_rows:
        adj.setdefault(int(r["src"]), []).append(int(r["dst"]))
    for u in adj:
        adj[u].sort()

    marked = {source}
    stack = [source]
    order = []
    while stack:
        u = stack.pop()
        order.append(u)
        for v in adj.get(u, []):
            if v not in marked:
                stack.append(v)
                marked.add(v)
    spark = graph.edges.sparkSession
    return spark.createDataFrame(
        [(int(u), int(i)) for i, u in enumerate(order)], "id long, dfs_order long"
    )


def dfs_edges_from(graph: Graph, source: int, max_local_nodes: int = 5_000_000) -> DataFrame:
    """(src, dst, visit_order) — DFS tree-edge visit order, exactly
    Traversal::DFSEdgesFrom (DFS.hpp:46-64: the handle fires when an
    UNMARKED neighbor is first seen from a popped node). Same physical
    strategy and guard as dfs_from."""
    reach = bfs_distances(graph, source).select("id")
    n_reach = reach.count()
    if n_reach > max_local_nodes:
        raise ValueError(
            f"reachable component has {n_reach} nodes > max_local_nodes="
            f"{max_local_nodes}; DFS order is inherently sequential"
        )
    sym = graph.edges if graph.directed else graph.symmetrized_edges()
    adj_rows = (
        sym.join(reach.withColumnRenamed("id", "src"), "src")
        .select("src", "dst")
        .distinct()
        .collect()
    )
    adj: dict[int, list[int]] = {}
    for r in adj_rows:
        adj.setdefault(int(r["src"]), []).append(int(r["dst"]))
    for u in adj:
        adj[u].sort()

    marked = {source}
    stack = [source]
    edges = []
    while stack:
        u = stack.pop()
        for v in adj.get(u, []):
            if v not in marked:
                edges.append((u, v))
                stack.append(v)
                marked.add(v)
    spark = graph.edges.sparkSession
    return spark.createDataFrame(
        [(int(u), int(v), int(i)) for i, (u, v) in enumerate(edges)],
        "src long, dst long, visit_order long",
    )
