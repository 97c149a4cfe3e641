"""Degree-preserving graph randomization (null models).

Reference: networkit/cpp/randomization/ — DegreePreservingShuffle.cpp
(random id permutation within equal-degree classes; directed degrees
compare as (in, out) pairs), EdgeSwitching.cpp:10-50 (Markov chain of
2-swaps: pick two edges, rewire (s1,t1),(s2,t2) → (s1,t2),(s2,t1),
reject self-loops and multi-edges). Their tests assert the invariants —
degree sequence preserved exactly, graph stays simple, and the edge set
actually randomizes (CurveballGTest/DegreePreservingShuffleGTest/
EdgeSwitchingGTest) — randomized output has no exact contract.

Determinism: every draw is the engine's shared seeded quadratic hash
(operators/embedding.py arithmetic), so both operators are pure
functions of (graph, seed) and the shuffle's DuckDB oracle replays
bit-identically.

Spark shapes:
- shuffle: nodes keyed by degree class; WITHIN each class two ranks —
  by hashed key and by id — are zipped (rank-join) to form the
  permutation. All groupBy/window work is per-class
  (Window.partitionBy(class)), fully parallel.
- edge switching: the reference chain is one swap at a time (inherently
  sequential). The batched substitute pairs DISJOINT edges per round
  (hash-bucketed pairing — each edge in at most one proposal), proposes
  the 2-swap with a hash-chosen orientation, and rejects any proposal
  that (a) forms a self-loop, (b) collides with an existing edge, or
  (c) collides with another proposal's new edge in the same batch
  (keep-none on conflict — conservative rejection keeps every accepted
  batch a valid sequence of reference swaps, so the invariants hold by
  construction; acceptance-rate differences only change mixing speed).
  Per round: one per-bucket pairing window, one anti-join against the
  edge set, one self-collision groupBy — all edge-table-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.embedding import WALK_HASH_M, _A, _B, _C, _D
from networkit_spark.plans.iterative import truncate


def _mix(*cols):
    """Seeded quadratic hash → BIGINT in [0, M) — shared arithmetic with
    operators/embedding.py (SQL-replicable, exact int64)."""
    m = F.lit(WALK_HASH_M)
    coeffs = [_A, _B, _C, _D]
    h1 = F.lit(0)
    for i, c in enumerate(cols):
        h1 = h1 + c * F.lit(coeffs[i % 4])
    h1 = F.pmod(h1, m)
    h2 = F.pmod(h1 * h1 + F.lit(_A) * h1 + F.lit(_B), m)
    return F.pmod(h2 * h2 + F.lit(_C) * h2 + F.lit(_D), m)


def degree_preserving_shuffle(graph: Graph, seed: int = 1) -> DataFrame:
    """(id, new_id) — a permutation that reassigns ids uniformly within
    equal-degree classes (DegreePreservingShuffle.cpp: undirected class
    = degree; directed class = (in, out) pair). Applying it relabels the
    graph while provably preserving every degree."""
    if graph.directed:
        outd = graph.edges.groupBy(F.col("src").alias("id")).agg(
            F.count("*").alias("od")
        )
        ind = graph.edges.groupBy(F.col("dst").alias("id")).agg(
            F.count("*").alias("ind")
        )
        cls = (
            graph.vertices()
            .join(outd, "id", "left")
            .join(ind, "id", "left")
            .select(
                "id",
                F.concat_ws(
                    "_",
                    F.coalesce("ind", F.lit(0)).cast("string"),
                    F.coalesce("od", F.lit(0)).cast("string"),
                ).alias("cls"),
            )
        )
    else:
        deg = graph.symmetrized_edges().groupBy(F.col("src").alias("id")).agg(
            F.count("*").alias("d")
        )
        cls = (
            graph.vertices()
            .join(deg, "id", "left")
            .select("id", F.coalesce("d", F.lit(0)).cast("string").alias("cls"))
        )
    # Skew guard: the low-degree classes hold most of a power-law graph
    # (billions of degree-1 nodes at web scale → one window partition).
    # Classes above `class_cap` are hash-split into subclasses permuted
    # independently — a random partition composed with within-part
    # permutations is still a valid degree-preserving shuffle (every
    # reassignment stays inside one degree class); only the mixing is
    # slightly coarser on the split giants.
    class_cap = 1_000_000
    sizes = cls.groupBy("cls").agg(F.count("*").alias("csz"))
    keyed = (
        cls.join(sizes, "cls")
        .select(
            "id",
            F.concat_ws(
                "#",
                "cls",
                F.when(F.col("csz") <= class_cap, F.lit(0))
                .otherwise(
                    F.pmod(
                        _mix(F.col("id"), F.lit(seed + 1)),
                        F.ceil(F.col("csz") / F.lit(class_cap)).cast("long"),
                    )
                )
                .cast("string"),
            ).alias("cls"),
            _mix(F.col("id"), F.lit(seed)).alias("k"),
        )
    )
    # two ranks per (sub)class: hashed order ↔ id order; zip them
    w_hash = Window.partitionBy("cls").orderBy("k", "id")
    w_id = Window.partitionBy("cls").orderBy("id")
    a = keyed.select("id", "cls", F.row_number().over(w_hash).alias("r"))
    b = keyed.select(F.col("id").alias("new_id"), "cls", F.row_number().over(w_id).alias("r"))
    return a.join(b, ["cls", "r"]).select("id", "new_id")


def shuffled_graph(graph: Graph, seed: int = 1) -> Graph:
    """The relabeled graph (DegreePreservingShuffle::getPermutation
    applied, as its callers do)."""
    perm = degree_preserving_shuffle(graph, seed)
    e = (
        graph.edges.join(perm.withColumnRenamed("id", "src"), "src")
        .select(F.col("new_id").alias("src"), "dst", "weight")
        .join(perm.withColumnRenamed("id", "dst"), "dst")
        .select("src", F.col("new_id").alias("dst"), "weight")
    )
    return Graph.from_edges(
        e,
        directed=graph.directed,
        weighted=graph.weighted,
        vertices=graph.vertices(),
        already_symmetrized=not graph.directed,
    )


def edge_switching(
    graph: Graph,
    switches_per_edge: float = 10.0,
    seed: int = 1,
    n_buckets: int = 64,
) -> Graph:
    """Batched 2-swap randomization of a SIMPLE UNDIRECTED graph; see
    module docstring for the substitution vs the sequential chain.
    Rounds ≈ 2·switches_per_edge (each round proposes ~|E|/2 swaps)."""
    if graph.directed:
        raise ValueError("edge_switching operates on undirected graphs")
    edges = truncate(
        graph.edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        ).distinct()
    )
    m = edges.count()
    rounds = max(1, int(round(2.0 * switches_per_edge)))

    for r in range(rounds):
        keyed = edges.select(
            "u",
            "v",
            _mix(F.col("u"), F.col("v"), F.lit(r), F.lit(seed)).alias("k"),
        ).withColumn("bkt", F.pmod(F.col("k"), F.lit(n_buckets)))
        wb = Window.partitionBy("bkt").orderBy("k", "u", "v")
        ranked = keyed.withColumn("rn", F.row_number().over(wb))
        pairs = (
            ranked.withColumn("pair", F.floor((F.col("rn") - 1) / 2))
            .withColumn("side", F.pmod(F.col("rn") - 1, F.lit(2)))
        )
        lhs = pairs.filter(F.col("side") == 0).select(
            "bkt", "pair", F.col("u").alias("a"), F.col("v").alias("b"), "k"
        )
        rhs = pairs.filter(F.col("side") == 1).select(
            "bkt", "pair", F.col("u").alias("c"), F.col("v").alias("d")
        )
        prop = lhs.join(rhs, ["bkt", "pair"])
        # orientation by hash bit: (a,d)+(c,b) or (a,c)+(b,d)
        flip = F.pmod(F.col("k"), F.lit(2)) == 0
        prop = prop.select(
            "bkt", "pair", "a", "b", "c", "d",
            F.when(flip, F.col("d")).otherwise(F.col("c")).alias("nb1"),
            F.when(flip, F.col("c")).otherwise(F.col("d")).alias("nb2"),
        ).select(
            "bkt", "pair", "a", "b", "c", "d",
            F.least("a", "nb1").alias("e1u"), F.greatest("a", "nb1").alias("e1v"),
            F.least("b", "nb2").alias("e2u"), F.greatest("b", "nb2").alias("e2v"),
        )
        # reject self-loops and degenerate overlaps
        ok = prop.filter(
            (F.col("e1u") != F.col("e1v"))
            & (F.col("e2u") != F.col("e2v"))
            & ~(
                (F.col("e1u") == F.col("e2u")) & (F.col("e1v") == F.col("e2v"))
            )
        )
        # reject collisions with surviving edges (conservative: full set)
        new_edges = ok.select(
            "bkt", "pair",
            F.explode(
                F.array(
                    F.struct(F.col("e1u").alias("u"), F.col("e1v").alias("v")),
                    F.struct(F.col("e2u").alias("u"), F.col("e2v").alias("v")),
                )
            ).alias("e"),
        ).select("bkt", "pair", F.col("e.u").alias("u"), F.col("e.v").alias("v"))
        hit_existing = (
            new_edges.join(edges, ["u", "v"], "left_semi")
            .select("bkt", "pair")
            .distinct()
        )
        dup_within = (
            new_edges.groupBy("u", "v")
            .agg(F.count("*").alias("c"), F.collect_set(F.struct("bkt", "pair")).alias("ps"))
            .filter(F.col("c") > 1)
            .select(F.explode("ps").alias("p"))
            .select(F.col("p.bkt").alias("bkt"), F.col("p.pair").alias("pair"))
            .distinct()
        )
        rejected = hit_existing.unionByName(dup_within).distinct()
        accepted = ok.join(rejected, ["bkt", "pair"], "left_anti")

        removed = accepted.select(
            F.explode(
                F.array(
                    F.struct(
                        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
                    ),
                    F.struct(
                        F.least("c", "d").alias("u"), F.greatest("c", "d").alias("v")
                    ),
                )
            ).alias("e")
        ).select(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
        added = accepted.select(
            F.explode(
                F.array(
                    F.struct(F.col("e1u").alias("u"), F.col("e1v").alias("v")),
                    F.struct(F.col("e2u").alias("u"), F.col("e2v").alias("v")),
                )
            ).alias("e")
        ).select(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
        edges = truncate(
            edges.join(removed, ["u", "v"], "left_anti").unionByName(added),
            release=edges,
        )

    assert edges.count() == m  # 2-swaps never change the edge count
    out = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), F.lit(1.0).alias("weight")
    )
    return Graph.from_edges(
        out, directed=False, weighted=graph.weighted, vertices=graph.vertices()
    )
