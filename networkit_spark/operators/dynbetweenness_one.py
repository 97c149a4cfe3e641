"""DynBetweennessOneNode — exact betweenness of ONE node x, maintained
incrementally under edge insertions / weight decreases.

Reference (networkit/cpp/centrality/DynBetweennessOneNode.cpp):
- run() (:23-146): per-pair state (dist, sigma, sigmax) where sigma =
  #shortest s→t paths and sigmax = #those through x (endpoint pairs
  count themselves: sigmax(s,x) = sigma(s,x), :52-70);
  bcx = Σ_{s≠x, t≠x, sigma≠0} sigmax/sigma over ORDERED pairs
  (:75-82 forNodes × forNodes).
- update() (:148-280): insertions / weight decreases only, else throw
  (:151-156); affected pairs get d' = d(s,u) + w + d(v,t) with
  sigma' = σ(s,u)·σ(v,t) on strict improvement and += on ties
  (:221-249), sigmax' by the product rule
  σx(s,u)·σ(v,t) + σ(s,u)·σx(v,t); bcx is adjusted by -old/+new per
  touched pair (:211-217, :251-256).
- updateBatch (:283-287): per-event sequential application; the GTest
  contract is state == fresh run on the edited graph.

Spark-native substitution — per-pair queue walks become relational
algebra over the (s, t, dist, sigma, sigmax) DataFrame:

fresh state:  dists from operators/apsp (self rows included), sigma by
  a shortest-path-DAG sweep (σ(s,v) = Σ over DAG in-arcs of σ(s,u),
  iterated to the fixed point — the DAG is acyclic so the iteration
  stabilizes in max-hop rounds), and sigmax in CLOSED FORM from the
  x-decomposition: every s→t shortest path through x splits uniquely
  at x, so σx(s,t) = σ(s,x)·σ(x,t) when d(s,x) + d(x,t) = d(s,t),
  σ(s,t) when x is an endpoint, else 0. No per-pair driver loop.

repair per event (u, v, w): every new shortest path crosses the
  inserted edge EXACTLY once (simple paths don't repeat vertices), so
  candidates decompose as old-state legs:
      via     = d(s,u) + w + d(v,t)
      σ_via   = σ(s,u)·σ(v,t)
      σx_via  = σx(s,u)·σ(v,t) + σ(s,u)·σx(v,t)
  — two filtered projections of the state (t = u side, s = v side)
  joined through the 1-row edge, exactly DynAPSP's cone shape. For
  undirected graphs BOTH orientations' candidates are built from the
  SAME old-state snapshot and min/sum-merged together (a path crosses
  the undirected edge once, in one direction — merging orientations
  sequentially would let the second see σ values already containing
  edge-using paths and overcount). Then one keyed merge:
      d'  = least(d_old, via)
      σ'  = σ_old·[d_old = d'] + σ_via·[via = d']
      σx' analogous.
  The reference's special (u, v) case (:226-240) emerges from the
  self rows (σ(u,u) = 1). Events that do not strictly lower the arc's
  stored weight are no-ops (the reference only ever sees genuinely
  applied additions); batches apply sequentially like updateBatch.

sigma/sigmax are DOUBLEs — the reference's own storage type
(edgeweight); bcx sums the ordered-pair ratios in one aggregation.

Scale: fresh state is APSP-class (O(n²) rows — web-scale callers use
the one-source-pair slice they need); each repair touches only the
cone product, one keyed merge against the big table, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.apsp import apsp
from networkit_spark.operators.dynapsp import _insert_edges
from networkit_spark.plans.iterative import truncate


def _sigma_state(graph: Graph) -> DataFrame:
    """(s, t, dist, sigma): all-pairs distances + shortest-path counts.
    dists from apsp; sigma via the per-source shortest-path DAG sweep
    (fixed-point iteration — each round extends counts one DAG level)."""
    dists = truncate(
        apsp(graph).select("s", F.col("id").alias("t"),
                           F.col("dist").cast("double").alias("dist"))
    )
    # one row per arc: undirected Graph.edges carries both orientations
    # and may hold duplicate rows depending on how the caller built the
    # edge table — duplicates would double every DAG sum (σ inflation
    # by 2^hops), so collapse to the min-weight simple arc set first
    arcs = (
        graph.edges.select("src", "dst", "weight")
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
    )
    # per-source DAG arcs: (s, u→v) with d(s,u) + w = d(s,v)
    du = dists.select("s", F.col("t").alias("src"), F.col("dist").alias("d_u"))
    dv = dists.select("s", F.col("t").alias("dst"), F.col("dist").alias("d_v"))
    dag = (
        arcs.join(du, "src")
        .join(dv, ["s", "dst"])
        .filter(F.col("d_u") + F.col("weight") == F.col("d_v"))
        .select("s", "src", "dst")
    )
    dag = truncate(dag)

    sigma = truncate(
        dists.select(
            "s", "t", F.when(F.col("s") == F.col("t"), 1.0).otherwise(0.0).alias("sigma")
        )
    )
    while True:
        prop = (
            sigma.select("s", F.col("t").alias("src"), "sigma")
            .join(dag, ["s", "src"])
            .groupBy("s", F.col("dst").alias("t"))
            .agg(F.sum("sigma").alias("acc"))
        )
        new_sigma = (
            sigma.select("s", "t").join(prop, ["s", "t"], "left")
            .select(
                "s", "t",
                F.when(F.col("s") == F.col("t"), 1.0)
                .otherwise(F.coalesce("acc", F.lit(0.0))).alias("sigma"),
            )
        )
        new_sigma = truncate(new_sigma)
        changed = (
            new_sigma.join(
                sigma.select("s", "t", F.col("sigma").alias("old")), ["s", "t"]
            )
            .filter(F.col("sigma") != F.col("old"))
            .limit(1)
            .count()
        )
        old = sigma
        sigma = new_sigma
        old.unpersist()
        if changed == 0:
            break
    out = dists.join(sigma, ["s", "t"]).select("s", "t", "dist", "sigma")
    out = truncate(out)
    dag.unpersist()
    sigma.unpersist()
    dists.unpersist()
    return out


def _with_sigmax(state: DataFrame, x: int) -> DataFrame:
    """Attach sigmax via the closed-form x-decomposition."""
    sx = state.filter(F.col("t") == x).select(
        "s", F.col("dist").alias("d_sx"), F.col("sigma").alias("sig_sx")
    )
    xt = state.filter(F.col("s") == x).select(
        F.col("t"), F.col("dist").alias("d_xt"), F.col("sigma").alias("sig_xt")
    )
    return (
        state.join(sx, "s", "left")
        .join(xt, "t", "left")
        .select(
            "s", "t", "dist", "sigma",
            F.when((F.col("s") == x) | (F.col("t") == x), F.col("sigma"))
            .when(
                F.col("d_sx").isNotNull()
                & F.col("d_xt").isNotNull()
                & (F.col("d_sx") + F.col("d_xt") == F.col("dist")),
                F.col("sig_sx") * F.col("sig_xt"),
            )
            .otherwise(0.0)
            .alias("sigmax"),
        )
    )


def one_node_state(graph: Graph, x: int) -> DataFrame:
    """DynBetweennessOneNode::run — (s, t, dist, sigma, sigmax)."""
    return truncate(_with_sigmax(_sigma_state(graph), x))


def one_node_bcx(state: DataFrame, x: int) -> float:
    """getbcx(): Σ over ordered pairs with s ≠ x, t ≠ x, sigma ≠ 0."""
    row = (
        state.filter((F.col("s") != x) & (F.col("t") != x) & (F.col("sigma") != 0))
        .agg(F.sum(F.col("sigmax") / F.col("sigma")).alias("bcx"))
        .first()
    )
    return float(row["bcx"] or 0.0)


def update_one_node(
    graph: Graph, state: DataFrame, x: int, added: DataFrame
) -> tuple[Graph, DataFrame]:
    """updateBatch: apply insertions / weight decreases sequentially and
    repair (s, t, dist, sigma, sigmax); the repaired state equals a
    fresh run on the edited graph. Other event types are unsupported —
    the reference throws (:151-156)."""
    spark = graph.edges.sparkSession
    # effective per-arc events: only strictly-improving arcs act
    old_w = {
        (r["src"], r["dst"]): r["weight"]
        for r in graph.edges.select("src", "dst", "weight")
        .join(
            F.broadcast(
                added.select("src", "dst").unionByName(
                    added.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
                )
            ),
            ["src", "dst"],
            "left_semi",
        )
        .collect()
    }
    events = []
    for r in added.collect():
        u, v = int(r["src"]), int(r["dst"])
        w = float(r["weight"]) if "weight" in added.columns else 1.0
        prev = old_w.get((u, v))
        if prev is None or w < prev:
            events.append((u, v, w))
            old_w[(u, v)] = w
            if not graph.directed:
                old_w[(v, u)] = w

    new_graph, _ = _insert_edges(graph, added)
    state = truncate(state.select("s", "t", "dist", "sigma", "sigmax"))

    for u, v, w in events:
        orients = [(u, v)] if graph.directed else [(u, v), (v, u)]
        cands = []
        for a, b in orients:
            su = state.filter(F.col("t") == a).select(
                "s",
                (F.col("dist") + F.lit(w)).alias("d_su_w"),
                F.col("sigma").alias("sig_su"),
                F.col("sigmax").alias("sgx_su"),
            )
            vt = state.filter(F.col("s") == b).select(
                F.col("t"),
                F.col("dist").alias("d_vt"),
                F.col("sigma").alias("sig_vt"),
                F.col("sigmax").alias("sgx_vt"),
            )
            cands.append(
                su.crossJoin(vt).select(
                    "s", "t",
                    (F.col("d_su_w") + F.col("d_vt")).alias("via"),
                    (F.col("sig_su") * F.col("sig_vt")).alias("sig_via"),
                    (
                        F.col("sgx_su") * F.col("sig_vt")
                        + F.col("sig_su") * F.col("sgx_vt")
                    ).alias("sgx_via"),
                )
            )
        cand = cands[0]
        for c in cands[1:]:
            cand = cand.unionByName(c)
        cand = cand.filter(F.col("s") != F.col("t"))
        # keep only each pair's minimal via; sum σ over orientations
        # achieving it (both-direction ties are distinct path sets)
        best = cand.groupBy("s", "t").agg(F.min("via").alias("via_min"))
        cand = (
            cand.join(best, ["s", "t"])
            .filter(F.col("via") == F.col("via_min"))
            .groupBy("s", "t")
            .agg(
                F.first("via_min").alias("via"),
                F.sum("sig_via").alias("sig_via"),
                F.sum("sgx_via").alias("sgx_via"),
            )
        )
        merged = (
            state.join(cand, ["s", "t"], "full")
            .select(
                "s", "t",
                F.least(F.col("dist"), F.col("via")).alias("nd"),
                "dist", "via", "sigma", "sigmax", "sig_via", "sgx_via",
            )
            .select(
                "s", "t",
                F.coalesce("nd", "dist", "via").alias("ndist"),
                (
                    F.when(F.col("dist") == F.coalesce("nd", "dist", "via"),
                           F.col("sigma")).otherwise(0.0)
                    + F.when(F.col("via") == F.coalesce("nd", "dist", "via"),
                             F.col("sig_via")).otherwise(0.0)
                ).alias("nsigma"),
                (
                    F.when(F.col("dist") == F.coalesce("nd", "dist", "via"),
                           F.col("sigmax")).otherwise(0.0)
                    + F.when(F.col("via") == F.coalesce("nd", "dist", "via"),
                             F.col("sgx_via")).otherwise(0.0)
                ).alias("nsigmax"),
            )
            .select(
                "s", "t",
                F.col("ndist").alias("dist"),
                F.col("nsigma").alias("sigma"),
                F.col("nsigmax").alias("sigmax"),
            )
        )
        state = truncate(merged, release=state)
    return new_graph, state
