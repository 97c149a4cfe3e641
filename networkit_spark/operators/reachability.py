"""ReachableNodes (reference: cpp/reachability/ReachableNodes.cpp).

Per-node counts of reachable vertices:

- undirected (ReachableNodes.cpp runUndirected, :158-164): the count is
  simply the size of the node's connected component — CC + a size join.
- directed exact (:25-84): condense to the SCC DAG (every node in an SCC
  reaches the same set), then count nodes reachable from each SCC. The
  reference BFS-es from every SCC; the distributed form is transitive-
  closure DOUBLING over the condensation — O(log diameter) rounds of
  pair-join + distinct, state = reachable SCC pairs. On web graphs the
  condensation is tiny relative to the graph (one giant SCC), but a
  long-path DAG makes the pair set quadratic — that is inherent to the
  EXACT answer (the reference's all-SCC BFS pays the same quadratic
  time); the estimate variant is the scale path.
- directed estimate (:86-155): the reference runs a node-order-dependent
  LB/UB dynamic program over the condensation (sequential, and its
  bounds depend on iteration order). This engine substitutes the
  standard distributed estimator — Flajolet–Martin reachability sketches
  (k seeded bit masks per node, OR-propagated along out-arcs to a
  fixpoint), the same machinery as the ANF effective-diameter operator
  (operators/distances.py) — returning an unbiased ~1/sqrt(k) relative-
  error estimate instead of [LB, UB] bounds. Documented substitution:
  sketches are the scalable form of the same "avoid per-source BFS"
  idea, and unlike the reference's bounds they are deterministic here
  (seeded hashes).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from networkit_spark.graph import Graph
from networkit_spark.plans.iterative import truncate


@dataclass
class ReachableNodesResult:
    counts: DataFrame  # (id, reachable) or (id, reachable_est)
    exact: bool


def _undirected_counts(g: Graph) -> DataFrame:
    from networkit_spark.operators.components import connected_components_twophase

    labels = connected_components_twophase(g).labels
    sizes = labels.groupBy("label").agg(F.count("*").alias("reachable"))
    return labels.join(sizes, "label").select("id", "reachable")


def _condensation(g: Graph):
    """(scc labels (id, label), condensation arcs (a, b) distinct, SCC
    sizes (label, size))."""
    from networkit_spark.operators.scc import strongly_connected_components

    labels = truncate(strongly_connected_components(g).labels)
    sizes = labels.groupBy("label").agg(F.count("*").alias("size"))
    la = labels.select(F.col("id").alias("src"), F.col("label").alias("a"))
    lb = labels.select(F.col("id").alias("dst"), F.col("label").alias("b"))
    arcs = (
        g.edges.join(la, "src").join(lb, "dst")
        .filter(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return labels, arcs, sizes


def _directed_exact(g: Graph, max_rounds: int = 20) -> DataFrame:
    labels, arcs, sizes = _condensation(g)
    ident = sizes.select(F.col("label").alias("a"), F.col("label").alias("b"))
    reach = truncate(arcs.unionByName(ident).distinct())
    n_pairs = reach.count()
    for _ in range(max_rounds):
        # doubling: a→b ∧ b→c ⇒ a→c; paths of length ≤ 2^k after k rounds
        step = (
            reach.alias("x")
            .join(reach.alias("y"), F.col("x.b") == F.col("y.a"))
            .select(F.col("x.a").alias("a"), F.col("y.b").alias("b"))
        )
        new = truncate(reach.unionByName(step).distinct(), release=reach)
        m = new.count()
        reach = new
        if m == n_pairs:
            break
        n_pairs = m
    per_scc = (
        reach.join(sizes.withColumnRenamed("label", "b"), "b")
        .groupBy(F.col("a").alias("label"))
        .agg(F.sum("size").alias("reachable"))
    )
    return labels.join(per_scc, "label").select("id", "reachable")


def _directed_estimate(
    g: Graph, k: int = 64, r: int = 7, seed: int = 42, max_hops: int = 64
) -> DataFrame:
    n = g.num_vertices()
    n_bits = int(math.ceil(math.log2(max(n, 2)))) + r
    edges = g.edges.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    mask_cols = [f"m{j}" for j in range(k)]

    def init_mask(j: int):
        h = F.xxhash64("id", F.lit(j), F.lit(seed))
        pos = F.bit_count(F.bitwise_not(h).bitwiseAND(h - 1))
        return F.when(pos < n_bits, F.pow(F.lit(2.0), pos).cast("long")).otherwise(
            F.lit(0).cast("long")
        )

    state = truncate(
        g.vertices().select(
            "id", *[init_mask(j).alias(c) for j, c in enumerate(mask_cols)]
        )
    )
    prev_tot = None
    for _ in range(max_hops):
        # m'(u) = m(u) | OR over out-neighbors v of m(v)
        gathered = (
            edges.join(
                state.select(F.col("id").alias("dst"), *mask_cols), "dst"
            )
            .groupBy(F.col("src").alias("id"))
            .agg(*[F.bit_or(c).alias(f"g_{c}") for c in mask_cols])
        )
        new = state.join(gathered, "id", "left").select(
            "id",
            *[
                F.col(c).bitwiseOR(F.coalesce(f"g_{c}", F.lit(0))).alias(c)
                for c in mask_cols
            ],
        )
        state = truncate(new, release=state)
        # fixpoint check: total mask popcount is monotone nondecreasing,
        # so an unchanged total means every mask is stable
        tot = state.agg(
            F.sum(sum([F.bit_count(c) for c in mask_cols], F.lit(0)))
        ).first()[0]
        if tot == prev_tot:
            break
        prev_tot = tot
    # FM estimate: 2^(mean least-unset-bit) / 0.77351
    lub = [
        (F.bit_count(F.col(c).bitwiseXOR(F.col(c) + 1)) - 1).cast("double")
        for c in mask_cols
    ]
    mean_b = sum(lub, F.lit(0.0)) / F.lit(float(k))
    edges.unpersist()
    return state.select(
        "id", (F.pow(F.lit(2.0), mean_b) / F.lit(0.77351)).alias("reachable_est")
    )


def reachable_nodes(g: Graph, exact: bool = True, **kw) -> ReachableNodesResult:
    if not g.directed:
        return ReachableNodesResult(_undirected_counts(g), True)
    if exact:
        return ReachableNodesResult(_directed_exact(g, **kw), True)
    return ReachableNodesResult(_directed_estimate(g, **kw), False)
