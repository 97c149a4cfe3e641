"""Dynamic centralities under batched GraphEvents — the engine's
dynamics-policy realization of the reference's per-event maintainers:

- DynBetweenness (cpp/centrality/DynBetweenness.cpp): exact betweenness
  kept current over edge insertions via iBet dependency repair.
- DynApproxBetweenness (DynApproxBetweenness.cpp): RK path-sample pool
  patched per event (insertions + deletions).
- DynKatzCentrality (DynKatzCentrality.cpp): per-level walk counts
  extended along inserted edges.
- DynTopHarmonicCloseness (DynTopHarmonicCloseness.cpp): top-k harmonic
  ranking with per-event affected-node bound repair.

Engine policy (COVERAGE.md dynamics note, same as DynCC / DynBFS /
DynamicBSuitorMatcher): events arrive in BATCHES; the batch is applied
to the distributed edge table once (upsert, last-event-wins) and the
score is recomputed by the corresponding engine operator, warm paths
where they exist. For the EXACT maintainers (DynBetweenness,
DynTopHarmonicCloseness, DynKatzCentrality at convergence) per-event
repair and post-batch recompute provably return the SAME scores — the
reference classes maintain exactly the static algorithm's output on the
current graph (their own GTests assert equality against a static
rerun). For the sampling maintainer (DynApproxBetweenness) the
recompute is a fresh draw from the same (epsilon, delta) estimator
family rather than a patched pool — same guarantee, different sample
(stated substitution; the reference's own output is sample-dependent
too). A per-event sequential repair has no distributed formulation at
10^12 edges; batch-apply + recompute is the scale-correct equivalent.

Event grammar: (type, u, v [, w] [, step, seq]) with GraphEvent.hpp
type names. EDGE_ADDITION / EDGE_REMOVAL / EDGE_WEIGHT_UPDATE mutate
the edge table (upsert); NODE_ADDITION inserts an isolated vertex;
NODE_REMOVAL drops the vertex and its incident edges (graph.pyx
removeNode semantics); TIME_STEP rows are ignored (batch boundary
markers). Unknown types raise, matching the reference update() guards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import Graph

_EDGE_TYPES = {"EDGE_ADDITION", "EDGE_REMOVAL", "EDGE_WEIGHT_UPDATE"}
_NODE_TYPES = {"NODE_ADDITION", "NODE_REMOVAL"}
_KNOWN = _EDGE_TYPES | _NODE_TYPES | {"TIME_STEP"}


def apply_graph_events(graph: Graph, events: DataFrame) -> Graph:
    """Apply one event batch to the graph (upsert, last-event-wins per
    canonical pair when (step, seq) ordering columns are present)."""
    ev = events.select(
        F.upper("type").alias("type"),
        *[c for c in ("u", "v", "w", "step", "seq") if c in events.columns],
    )
    bad = (
        ev.select("type").distinct()
        .filter(~F.col("type").isin(*_KNOWN))
        .limit(1)
        .collect()
    )
    if bad:
        raise ValueError(f"Event type not allowed: {bad[0]['type']}")

    edge_ev = ev.filter(F.col("type").isin(*_EDGE_TYPES)).select(
        "type",
        F.least("u", "v").alias("a"),
        F.greatest("u", "v").alias("b"),
        (F.col("w") if "w" in ev.columns else F.lit(1.0))
        .cast("double").alias("w"),
        *[F.col(c) for c in ("step", "seq") if c in ev.columns],
    )
    if "step" in edge_ev.columns or "seq" in edge_ev.columns:
        order = [F.col(c).desc() for c in ("step", "seq") if c in edge_ev.columns]
        wlast = Window.partitionBy("a", "b").orderBy(*order)
        edge_ev = (
            edge_ev.withColumn("rn", F.row_number().over(wlast))
            .filter("rn = 1").drop("rn")
        )
    adds = edge_ev.filter(F.col("type") != "EDGE_REMOVAL").select(
        F.col("a").alias("src"), F.col("b").alias("dst"),
        F.col("w").alias("weight"),
    )
    touched = edge_ev.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    g = graph.remove_edges(touched).add_edges(adds)

    node_ev = ev.filter(F.col("type").isin(*_NODE_TYPES))
    # implicit node materialization: reference streams emit NODE_ADDITION
    # before the first edge touching a node (GraphUpdater order); a batch
    # that omits it still names the node in its edge events — union the
    # addition endpoints in so both stream styles replay
    new_nodes = (
        node_ev.filter(F.col("type") == "NODE_ADDITION")
        .select(F.col("u").cast("long").alias("id"))
        .unionByName(adds.select(F.col("src").alias("id")))
        .unionByName(adds.select(F.col("dst").alias("id")))
    )
    dead = [
        int(r["u"])
        for r in node_ev.filter(F.col("type") == "NODE_REMOVAL")
        .select("u").collect()
    ]
    if new_nodes.limit(1).count():
        g = g.add_nodes(new_nodes)
    for u in dead:
        g = g.remove_node(u)
    return g


def dyn_betweenness(
    graph: Graph, events: DataFrame, normalized: bool = False
) -> tuple[Graph, DataFrame]:
    """(updated_graph, (id, score)) — DynBetweenness contract: scores
    equal the exact static betweenness of the post-batch graph."""
    from networkit_spark.operators.betweenness import betweenness_centrality

    g = apply_graph_events(graph, events)
    return g, betweenness_centrality(g, normalized=normalized)


def dyn_approx_betweenness(
    graph: Graph, events: DataFrame, n_samples: int = 64, seed: int = 42
) -> tuple[Graph, DataFrame]:
    """(updated_graph, (id, score)) — DynApproxBetweenness contract via
    a fresh estimate from the same sampled-source estimator family."""
    from networkit_spark.operators.betweenness import estimate_betweenness

    g = apply_graph_events(graph, events)
    return g, estimate_betweenness(g, n_samples=n_samples, seed=seed)


def dyn_katz_centrality(
    graph: Graph, events: DataFrame, alpha: float | None = None,
    beta: float = 0.1, tol: float = 1e-8,
) -> tuple[Graph, DataFrame]:
    """(updated_graph, (id, score)) — DynKatzCentrality contract at
    convergence: Katz scores of the post-batch graph."""
    from networkit_spark.operators.centrality import katz_centrality

    g = apply_graph_events(graph, events)
    kw = dict(beta=beta, tol=tol)
    if alpha is not None:
        kw["alpha"] = alpha
    return g, katz_centrality(g, **kw)


def dyn_top_harmonic_closeness(
    graph: Graph, events: DataFrame, k: int = 10
) -> tuple[Graph, DataFrame]:
    """(updated_graph, top-k (id, score)) — DynTopHarmonicCloseness
    contract: the exact top-k harmonic ranking of the post-batch
    graph."""
    from networkit_spark.operators.topcloseness import top_closeness

    g = apply_graph_events(graph, events)
    return g, top_closeness(g, k=k, harmonic=True)
