"""EdmondsKarp s-t maximum flow / minimum cut.

Reference: networkit/cpp/flow/EdmondsKarp.cpp:20-57 (BFS augmenting
paths carrying `gain` = the path's bottleneck residual), run() loop
(flow += gain until the BFS no longer reaches the sink), getMaxFlow /
getSourceSet / getFlow accessors, fixtures EdmondsKarpGTest.cpp:18-80.

Semantics reproduced:
- shortest (fewest-hop) augmenting paths: each augmentation is a BFS on
  the residual graph, exactly the reference's `BFS()`; `gain[v]` is
  folded into the frontier state like EdmondsKarp.cpp:42 so the
  bottleneck is known when the sink is reached.
- undirected edges carry capacity in both directions (the reference's
  signed flow on an undirected edge id ≡ two anti-parallel arcs; the
  max-flow value and min cut are identical).
- getSourceSet = nodes the FINAL failed residual BFS reaches
  (EdmondsKarp.cpp:139-150 does the same reachability pass).
- flows are reported as net flow per original arc direction, so
  getFlow(u, v) matches the reference's value on the direction the
  edge was inserted with.

Spark shape: the distributed piece is the residual BFS — a frontier
semi-join loop over the capacity table (hash-partitioned by src once)
with the residual computed per pass from two broadcast joins against
the CURRENT flow table. The flow table itself is path-support sized
(≤ augmentations × path length rows), lives as a broadcast-size
DataFrame mirrored on the driver, and is the only state the
augmentation updates. Edmonds-Karp is O(V·E²) worst case — a cut/flow
primitive, not a corpus-scan kernel; at web scale the win is that the
reachability work (the E-sized part) is the distributed half.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from networkit_spark.graph import Graph
from networkit_spark.plans import local_guard
from networkit_spark.plans.iterative import truncate


@dataclass
class MaxFlowResult:
    value: float
    flows: DataFrame  # (src, dst, flow) net flow per original arc, > 0 only
    source_set: DataFrame  # (id) — the source side of a minimum cut


def max_flow(
    graph: Graph,
    source: int,
    sink: int,
    max_augmentations: int = 10_000,
) -> MaxFlowResult:
    """Edmonds-Karp with BFS-carried bottleneck gains."""
    if source == sink:
        raise ValueError("source and sink must differ")
    spark = graph.edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    arcs = graph.edges.select("src", "dst", "weight")
    if not graph.directed:
        arcs = graph.symmetrized_edges().select("src", "dst", "weight")
    arcs = (
        arcs.filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("cap"))
    )
    # make sure the pushback arc exists for every forward arc (capacity 0)
    rev = arcs.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(0.0).alias("cap")
    )
    arcs_all = truncate(
        arcs.unionByName(rev)
        .groupBy("src", "dst")
        .agg(F.max("cap").alias("cap"))
        .repartition(n_part, "src")
    )

    flow: dict[tuple[int, int], float] = {}  # net: at most one of (u,v)/(v,u)
    value = 0.0
    inf = float("inf")

    def _flow_df():
        if not flow:
            return spark.createDataFrame([], "fu long, fv long, f double")
        return spark.createDataFrame(
            [(int(u), int(v), float(x)) for (u, v), x in flow.items()],
            "fu long, fv long, f double",
        )

    def _residual():
        fdf = F.broadcast(_flow_df())
        r = (
            arcs_all.join(
                fdf.select(
                    F.col("fu").alias("src"), F.col("fv").alias("dst"),
                    F.col("f").alias("f_fwd"),
                ),
                ["src", "dst"],
                "left",
            )
            .join(
                fdf.select(
                    F.col("fv").alias("src"), F.col("fu").alias("dst"),
                    F.col("f").alias("f_rev"),
                ),
                ["src", "dst"],
                "left",
            )
            .select(
                "src",
                "dst",
                (
                    F.col("cap")
                    - F.coalesce("f_fwd", F.lit(0.0))
                    + F.coalesce("f_rev", F.lit(0.0))
                ).alias("rcap"),
            )
            .filter(F.col("rcap") > 0)
        )
        return r

    def _bfs(residual: DataFrame):
        """Frontier BFS carrying (gain, pred); returns (pred_map for the
        path via point lookups, gain_at_sink, visited_df)."""
        visited = spark.createDataFrame(
            [(int(source), None, inf)], "id long, pred long, gain double"
        )
        visited = truncate(visited)
        frontier = visited
        while True:
            cand = (
                frontier.join(residual, frontier["id"] == residual["src"])
                .select(
                    F.col("dst").alias("nid"),
                    F.col("id").alias("npred"),
                    F.least(F.col("gain"), F.col("rcap")).alias("ngain"),
                )
                .join(visited.select(F.col("id").alias("nid")), "nid", "left_anti")
            )
            nxt = (
                cand.groupBy("nid")
                .agg(
                    F.max(
                        F.struct(
                            F.col("ngain"), (-F.col("npred")).alias("np"), F.col("npred")
                        )
                    ).alias("b")
                )
                .select(
                    F.col("nid").alias("id"),
                    F.col("b.npred").alias("pred"),
                    F.col("b.ngain").alias("gain"),
                )
            )
            nxt = truncate(nxt)
            if nxt.limit(1).count() == 0:
                return None, 0.0, visited
            hit = nxt.filter(F.col("id") == sink).first()
            new_visited = truncate(visited.unionByName(nxt), release=visited)
            if hit is not None:
                return new_visited, float(hit["gain"]), new_visited
            visited = new_visited
            frontier = nxt

    visited_final = None
    for _ in range(max_augmentations):
        residual = _residual()
        pred_df, gain, visited = _bfs(residual)
        if pred_df is None or gain <= 0:
            visited_final = visited
            break
        # backtrack sink → source; shortest paths are diameter-bounded,
        # so the point lookups are a handful of broadcast-filter jobs
        path = []
        cur = sink
        while cur != source:
            row = pred_df.filter(F.col("id") == cur).first()
            prev = int(row["pred"])
            path.append((prev, cur))
            cur = prev
        for u, v in path:
            back = flow.get((v, u), 0.0)
            if back >= gain:
                flow[(v, u)] = back - gain
            else:
                flow[(u, v)] = flow.get((u, v), 0.0) + gain - back
                if (v, u) in flow:
                    del flow[(v, u)]
            if flow.get((u, v)) == 0.0:
                del flow[(u, v)]
            if flow.get((v, u)) == 0.0:
                del flow[(v, u)]
        value += gain
    else:
        raise RuntimeError(
            f"max_flow did not converge within {max_augmentations} augmentations"
        )

    flows = _flow_df().select(
        F.col("fu").alias("src"), F.col("fv").alias("dst"), F.col("f").alias("flow")
    )
    source_set = visited_final.select("id")
    arcs_all.unpersist()
    return MaxFlowResult(value=value, flows=truncate(flows), source_set=truncate(source_set))


def cut_clustering(graph: Graph, alpha: float) -> DataFrame:
    """(id, label) — CutClustering (community/CutClustering.cpp:18-78,
    Flake–Tarjan–Tsioutsiouliklis): augment the graph with an artificial
    sink t connected to every node at weight alpha; process nodes in
    descending degree order, and for each still-unlabeled node u run
    min-cut(u, t) and label u's whole source side with u (source sides
    are nested-or-disjoint, so later cuts absorb earlier clusters
    exactly as the reference loop does).

    The per-node loop is the reference's own sequential pruned schedule
    (each iteration depends on coverage so far) — a pytest-scale driver
    contract like GCE/LFM, but each min-cut runs the engine's
    DISTRIBUTED Edmonds–Karp; the cluster count, not n, bounds the
    number of flows."""
    spark = graph.edges.sparkSession
    v = graph.vertices()
    t = int(v.agg(F.max("id")).first()[0]) + 1
    base = (
        graph.symmetrized_edges()
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst", "weight")
    )
    sink_arcs = v.select(
        F.col("id").alias("src"), F.lit(t).alias("dst"),
        F.lit(float(alpha)).alias("weight"),
    )
    aug = Graph.from_edges(
        base.unionByName(sink_arcs),
        directed=False,
        weighted=True,
        vertices=v.unionByName(spark.createDataFrame([(t,)], "id long")),
    )
    deg_rows = (
        graph.symmetrized_edges()
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("d"))
        .collect()
    )
    deg = {r["id"]: r["d"] for r in deg_rows}
    order = sorted(
        (r["id"] for r in v.collect()),
        key=lambda u: (-deg.get(u, 0), u),
    )
    labels: dict = {}
    for u in order:
        if u in labels:
            continue
        res = max_flow(aug, int(u), t)
        for row in res.source_set.collect():
            labels[row["id"]] = u
    return spark.createDataFrame(
        [(int(k), int(lb)) for k, lb in labels.items()], "id long, label long"
    )


def cut_clustering_hierarchy(graph: Graph) -> dict:
    """{alpha_lower_bound: labels DataFrame} — the complete CutClustering
    hierarchy (community/CutClustering.cpp:81-266 getClusterHierarchy /
    clusterHierarchyRecursion, Flake–Tarjan parametric breakpoint
    search). Each stored partition is the CutClustering result for every
    alpha in [key, next_key); key 0 is the connected-components
    partition, key -1 (disconnected graphs only) the whole-graph
    cluster, and the largest key maps to the all-singletons partition.

    Semantics reproduced: upper bound = max(2, max edge weight + 1)
    (:86-91); breakpoint candidate (upperCut − lowerCut)/(lowerSize −
    upperSize) maximized over the lower cluster's representative and
    every upper-cluster representative nested inside it (:177-204);
    epsilon push above the breakpoint so ranges never collide
    (:206-212); nested-partition comparison by cluster count (:240-246);
    the lower==middle numerical-degeneracy guard throws (:248-251).
    Component/whole-graph representatives are the cluster's MIN node id
    — the reference takes an arbitrary race winner / random node
    (:101-107, :120-122), any representative is valid; min-id is the
    engine's deterministic choice.

    Like cut_clustering above this is the reference's own sequential
    outer schedule (each breakpoint depends on the clusterings found so
    far) — a pytest-scale driver contract; every min-cut inside the
    per-breakpoint cut_clustering call runs the DISTRIBUTED
    Edmonds–Karp, and the number of solves is bounded by the number of
    distinct clusterings in the hierarchy, not by n."""
    import sys

    spark = graph.edges.sparkSession
    eps = sys.float_info.epsilon

    pull = (
        graph.symmetrized_edges()
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst", "weight")
    )
    local_guard.guard_local_collect(
        pull.count(), what="cut-clustering hierarchy edge list"
    )
    und = pull.collect()
    edges = [(int(r["src"]), int(r["dst"]), float(r["weight"])) for r in und]
    nodes = sorted(int(r["id"]) for r in graph.vertices().collect())

    lower, upper = 0.0, 2.0
    if graph.weighted and edges:
        upper = max(upper, max(w for _, _, w in edges)) + 1.0

    # lower bound partition: connected components, min-id representative
    parent = {u: u for u in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v, _ in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    lower_clusters = {u: find(u) for u in nodes}

    result: dict[float, dict] = {0.0: dict(lower_clusters)}
    n_components = len(set(lower_clusters.values()))
    if n_components > 1:
        rep = nodes[0]
        result[-1.0] = {u: rep for u in nodes}

    upper_clusters = {u: u for u in nodes}  # allToSingletons

    def cluster_stats(labels):
        sizes: dict = {}
        cut: dict = {}
        for u in nodes:
            sizes[labels[u]] = sizes.get(labels[u], 0) + 1
        for u, v, w in edges:
            if labels[u] != labels[v]:
                cut[labels[u]] = cut.get(labels[u], 0.0) + w
                cut[labels[v]] = cut.get(labels[v], 0.0) + w
        return sizes, cut

    def middle_labels(alpha):
        rows = cut_clustering(graph, alpha).collect()
        return {int(r["id"]): int(r["label"]) for r in rows}

    def recursion(lower, lower_clusters, upper, upper_clusters):
        nonlocal result
        while True:
            middle = None
            lower_sizes, lower_cut = cluster_stats(lower_clusters)
            upper_sizes, upper_cut = cluster_stats(upper_clusters)

            for lc, lsize in sorted(lower_sizes.items()):
                if lsize == upper_sizes[upper_clusters[lc]]:
                    continue
                upper_size = upper_sizes[upper_clusters[lc]]
                lower_weight = lower_cut.get(lc, 0.0)
                upper_weight = upper_cut.get(upper_clusters[lc], 0.0)
                bp = (upper_weight - lower_weight) / (float(lsize) - upper_size)
                for u in nodes:
                    if (
                        lower_clusters[u] == lc
                        and upper_clusters[u] == u
                        and u != lc
                    ):
                        tmp = (upper_cut.get(u, 0.0) - lower_weight) / (
                            float(lsize) - upper_sizes[u]
                        )
                        if tmp > bp:
                            bp = tmp
                            upper_weight = upper_cut.get(u, 0.0)
                            upper_size = upper_sizes[u]
                if bp + eps < upper:
                    middle = bp + eps
                    break

            if middle is None:
                if upper not in result:
                    result[upper] = dict(upper_clusters)
                return

            mid = middle_labels(middle)
            n_mid = len(set(mid.values()))
            if n_mid == len(lower_sizes):
                raise RuntimeError(
                    "Error: Lower clustering is middle clustering, probably "
                    "numerical inaccuracies caused this"
                )
            if n_mid == len(upper_sizes):
                upper = middle
                result[upper] = dict(upper_clusters)
            else:
                recursion(lower, dict(lower_clusters), middle, dict(mid))
                lower_clusters = mid

    recursion(lower, dict(lower_clusters), upper, dict(upper_clusters))
    return {
        alpha: spark.createDataFrame(
            [(int(u), int(lb)) for u, lb in labels.items()], "id long, label long"
        )
        for alpha, labels in sorted(result.items())
    }
