"""Node2Vec: biased second-order random walks + skip-gram embeddings.

Reference: networkit/cpp/embedding/Node2Vec.cpp:32-70,
BiasedRandomWalk.cpp:64-170, LearnEmbedding.hpp:51-53 (SNAP node2vec,
Grover & Leskovec 2016). Semantics reproduced:

- constructor contract (Node2Vec.cpp:32-46): node ids must be continuous
  0..n-1 and the graph must have no isolated nodes — both raise.
- walk shape (BiasedRandomWalk.cpp:107-140 oneWalk): `walks_per_node`
  walks of length `walk_length` start at every node; the FIRST step is
  uniform over the start's neighbors (`Aux::Random::index(nn)`, :122);
  every later step from dst, having arrived from src, picks neighbor x
  with weight w(dst,x)/p if x == src, w(dst,x) if x ∈ N(src), else
  w(dst,x)/q (preprocessNode, :80-90). A node with out-degree 0 ends the
  walk early (:116-118, :128-130).
- learning (Node2Vec.cpp:64-66): skip-gram with negative sampling over
  the walk corpus, window 10, 1 iteration, D dimensions; the reference's
  own tests assert only that features are finite and D-dimensional
  (EmbeddingGTest.cpp:33-71) — randomized SGD has no exact contract.

Determinism: the reference samples with a global URNG (run-to-run
nondeterministic). This engine replaces every draw with a seeded integer
hash shared with the DuckDB oracle:

    h1 = (walk*2654435761 + pos*40503 + cand*97 + seed*1000003) mod M
    h2 = (h1² + 2654435761·h1 + 40503) mod M      (M = 1_000_000_007)
    h3 = (h2² + 97·h2 + 1000003) mod M
    u  = (h3 + 1) / (M + 1)                        ∈ (0, 1]

The two quadratic rounds are the nonlinearity: a plain linear hash
leaves u nearly constant across nearby candidate ids (Δu = 97/M), which
collapses the weighted draw into "max weight always wins". All products
stay under 2^63, so Spark and DuckDB evaluate the identical exact
integer arithmetic.

and picks the next hop by Efraimidis–Vassilvitskii weighted reservoir:
argmax over candidates of ln(u)/w' (equivalent to argmax u^(1/w'));
ties (measure zero) break toward the smaller candidate id. Every walk
is then a pure function of (graph, p, q, seed) and replays identically
in ANSI SQL — the driver oracle chains one CTE per step.

Spark shape (the 100 TB path):
- walk state is one row per live walk (walk, prev, cur) — walks-count
  sized, NOT corpus sized; each step is (1) a join against the arc
  table on cur = src (arc table hash-partitioned by src once, reused
  every step), (2) a membership join against the same arc table on
  (prev, x) to flag x ∈ N(prev), (3) one argmax hash-aggregation per
  walk. No Python in the loop; lineage truncated every few steps like
  PageRank supersteps.
- the trainer is partition-local Hogwild SGD over the (center, context)
  pair stream with per-partition model replicas averaged at the end of
  each iteration (`mapInPandas`, numpy batch ops). A replica holds the
  full n x d matrix — fine to ~10M nodes x 128 dims per executor; past
  that shard the vocabulary by id range and train per shard (documented
  cutover, same contract).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from networkit_spark.graph import Graph
from networkit_spark.plans.iterative import truncate

def _sat_sigmoid(z: "np.ndarray") -> "np.ndarray":
    """word2vec's truncated sigmoid: exactly 0/1 outside ±MAX_EXP=6, so
    saturated examples contribute a zero gradient (the property that
    keeps SGNS weights bounded)."""
    return np.where(
        z > 6.0,
        1.0,
        np.where(z < -6.0, 0.0, 1.0 / (1.0 + np.exp(-np.clip(z, -6.0, 6.0)))),
    )


# Shared with oracles.walk_hash_sql — change together.
WALK_HASH_M = 1_000_000_007
_A, _B, _C, _D = 2654435761, 40503, 97, 1000003


def _u(walk_col, pos: int, cand_col, seed: int):
    """Deterministic uniform (0,1] draw, identical in Spark and DuckDB
    (see module docstring for the shared arithmetic)."""
    m = F.lit(WALK_HASH_M)
    h1 = F.pmod(
        walk_col * F.lit(_A)
        + F.lit(pos) * F.lit(_B)
        + cand_col * F.lit(_C)
        + F.lit(seed) * F.lit(_D),
        m,
    )
    h2 = F.pmod(h1 * h1 + F.lit(_A) * h1 + F.lit(_B), m)
    h3 = F.pmod(h2 * h2 + F.lit(_C) * h2 + F.lit(_D), m)
    return (h3 + F.lit(1)).cast("double") / F.lit(float(WALK_HASH_M + 1))


def biased_random_walks(
    graph: Graph,
    p: float = 1.0,
    q: float = 1.0,
    walk_length: int = 80,
    walks_per_node: int = 10,
    seed: int = 1,
    checkpoint_every: int = 4,
) -> DataFrame:
    """(walk: long, pos: int, node: long) — `walks_per_node` biased
    second-order walks from every node; walk ids are
    node * walks_per_node + c. Walks shorten at out-degree-0 nodes
    exactly like the reference (BiasedRandomWalk.cpp:116-130)."""
    spark = graph.edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    arcs = (
        (graph.edges if graph.directed else graph.symmetrized_edges())
        .select("src", "dst", "weight")
        .repartition(n_part, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    arcs.count()
    # membership side for the x ∈ N(src_prev) test; second-order bias
    # reads the PREVIOUS node's out-neighborhood (preprocessNode builds
    # tNbrs from neighborRange(t), BiasedRandomWalk.cpp:66-70)
    nbr = arcs.select(
        F.col("src").alias("pa"), F.col("dst").alias("pb"), F.lit(True).alias("is_nb")
    )

    starts = graph.vertices().select("id")
    if walks_per_node > 1:
        starts = starts.crossJoin(
            spark.range(walks_per_node).select(F.col("id").alias("c"))
        )
    else:
        starts = starts.withColumn("c", F.lit(0))
    starts = starts.select(
        (F.col("id") * walks_per_node + F.col("c")).alias("walk"),
        F.col("id").alias("cur"),
    )

    out = [starts.select("walk", F.lit(0).alias("pos"), F.col("cur").alias("node"))]
    if walk_length == 1:
        result = out[0]
        arcs.unpersist()
        return result

    # First hop: uniform over neighbors (weight ignored, :122).
    first = (
        starts.join(arcs, starts["cur"] == arcs["src"])
        .select("walk", "cur", "dst", _u(F.col("walk"), 1, F.col("dst"), seed).alias("u"))
        .groupBy("walk")
        .agg(
            F.max("cur").alias("prev"),  # constant per walk
            F.max(F.struct(F.col("u"), (-F.col("dst")).alias("nd"), F.col("dst"))).alias("b"),
        )
        .select("walk", "prev", F.col("b.dst").alias("cur"))
    )
    state = truncate(first)
    out.append(state.select("walk", F.lit(1).alias("pos"), F.col("cur").alias("node")))

    for pos in range(2, walk_length):
        cand = (
            state.join(arcs, state["cur"] == arcs["src"])
            .select("walk", "prev", "cur", "dst", "weight")
            .join(
                nbr,
                (F.col("prev") == F.col("pa")) & (F.col("dst") == F.col("pb")),
                "left",
            )
        )
        w_adj = (
            F.when(F.col("dst") == F.col("prev"), F.col("weight") / F.lit(p))
            .when(F.col("is_nb"), F.col("weight"))
            .otherwise(F.col("weight") / F.lit(q))
        )
        key = F.log(_u(F.col("walk"), pos, F.col("dst"), seed)) / w_adj
        nxt = (
            cand.select("walk", "cur", "dst", key.alias("k"))
            .groupBy("walk")
            .agg(
                F.max("cur").alias("prev"),
                F.max(F.struct(F.col("k"), (-F.col("dst")).alias("nd"), F.col("dst"))).alias("b"),
            )
            .select("walk", "prev", F.col("b.dst").alias("cur"))
        )
        if pos % checkpoint_every == 0 or pos == walk_length - 1:
            nxt = truncate(nxt, release=state)
        state = nxt
        out.append(state.select("walk", F.lit(pos).alias("pos"), F.col("cur").alias("node")))

    result = out[0]
    for frame in out[1:]:
        result = result.unionByName(frame)
    return result


def _validate(graph: Graph) -> int:
    """Reference constructor contract (Node2Vec.cpp:32-46): continuous
    ids 0..n-1, no isolated nodes. Returns n."""
    stats = (
        graph.vertices()
        .agg(
            F.count("*").alias("n"),
            F.min("id").alias("lo"),
            F.max("id").alias("hi"),
        )
        .first()
    )
    n = int(stats["n"])
    if n == 0:
        raise ValueError("empty graph")
    if int(stats["lo"]) != 0 or int(stats["hi"]) != n - 1:
        raise ValueError("The node ids of the graph must be continuous.")
    deg = graph.symmetrized_edges().select(F.col("src").alias("id")).distinct()
    isolated = graph.vertices().join(deg, "id", "left_anti").limit(1).count()
    if isolated:
        raise ValueError("Isolated nodes are not allowed.")
    return n


def skipgram_pairs(walks: DataFrame, window: int = 10) -> DataFrame:
    """(center, context) pairs within `window` positions inside one walk
    — the skip-gram corpus, as a distributed self-join on the walk id."""
    a = walks.select("walk", F.col("pos").alias("pi"), F.col("node").alias("center"))
    b = walks.select("walk", F.col("pos").alias("pj"), F.col("node").alias("context"))
    return (
        a.join(b, "walk")
        .filter(
            (F.col("pi") != F.col("pj"))
            & (F.abs(F.col("pi") - F.col("pj")) <= window)
        )
        .select("center", "context")
    )


def learn_embeddings(
    pairs: DataFrame,
    n: int,
    dim: int,
    negatives: int = 5,
    lr: float = 0.025,
    iterations: int = 1,
    local_epochs: int = 1,
    seed: int = 1,
) -> DataFrame:
    """SGNS over the pair stream: per-partition Hogwild replicas from a
    shared seeded init, averaged after each iteration (LearnEmbedding's
    OpenMP threads share one model; partition-averaging is the shared-
    nothing analog). Negative contexts are drawn from the unigram^0.75
    table with the same seeded-hash scheme as the walks. Returns
    (id: long, vector: array<float>)."""
    spark = pairs.sparkSession
    freq = (
        pairs.groupBy(F.col("context").alias("id")).agg(F.count("*").alias("f")).collect()
    )
    noise = np.zeros(n, dtype=np.float64)
    for r in freq:
        noise[int(r["id"])] = float(r["f"]) ** 0.75
    if noise.sum() <= 0:
        noise[:] = 1.0
    noise_cdf = np.cumsum(noise / noise.sum())
    bc = spark.sparkContext.broadcast(noise_cdf)

    syn0 = None
    pair_df = truncate(
        pairs.select(F.col("center").cast("long"), F.col("context").cast("long"))
    )
    # One replica per ~100k pairs (bounded by the session's parallelism):
    # on a small corpus, spreading the stream over near-empty partitions
    # just dilutes the model average with untouched replicas.
    n_pairs = pair_df.count()
    max_parts = int(spark.sparkContext.defaultParallelism)
    n_replicas = max(1, min(max_parts, n_pairs // 100_000 + 1))
    pair_df = pair_df.repartition(n_replicas)

    for it in range(iterations):
        init = syn0  # None on the first pass → seeded init inside workers
        b_init = spark.sparkContext.broadcast(init)

        def train(batches, it=it, b_init=b_init):
            # Partition-local Hogwild SGNS, vectorized in mini-batches of
            # 256 pairs (gather → sigmoid → scatter-add via np.add.at);
            # the intra-chunk staleness is the same relaxation word2vec's
            # lock-free threads make. BOTH matrices (word s0, context s1)
            # persist across iterations via the broadcast; the pair
            # stream is reshuffled per chunk with a seeded permutation so
            # walk-ordered corpora don't feed correlated updates.
            rng = np.random.RandomState(seed + it)
            if b_init.value is None:
                s0 = (rng.rand(n, dim) - 0.5) / dim
                s1 = np.zeros((n, dim), dtype=np.float64)
            else:
                s0 = b_init.value[0].astype(np.float64).copy()
                s1 = b_init.value[1].astype(np.float64).copy()
            cdf = bc.value
            # Chunked vectorization trades per-pair sequencing for speed;
            # within a chunk all gathers read pre-chunk weights, so rows
            # colliding in one chunk take one oversized step. Harmless
            # when vocab >> chunk (collisions rare); on tiny vocabularies
            # it diverges, so the chunk shrinks toward word2vec's
            # sequential chunk=1.
            chunk = int(max(1, min(256, n // 4)))
            # The replica's pair slice is small (~100k rows per replica by
            # construction); buffering it locally lets `local_epochs`
            # passes run in memory instead of as extra Spark rounds.
            cs, xs = [], []
            for pdf in batches:
                if len(pdf):
                    cs.append(pdf["center"].to_numpy(dtype=np.int64))
                    xs.append(pdf["context"].to_numpy(dtype=np.int64))
            if not cs:
                return
            call0 = np.concatenate(cs)
            xall0 = np.concatenate(xs)
            count = len(call0) * local_epochs
            for ep in range(local_epochs):
                perm = rng.permutation(len(call0))
                call, xall = call0[perm], xall0[perm]
                for lo in range(0, len(call), chunk):
                    c = call[lo : lo + chunk]
                    x = xall[lo : lo + chunk]
                    h = s0[c]  # (B, d)
                    grad_h = np.zeros_like(h)
                    # positive examples
                    cx = s1[x]
                    # word2vec saturates the sigmoid EXACTLY to 0/1 past
                    # ±MAX_EXP=6 (the precomputed expTable), which zeroes
                    # the gradient there; a soft clip leaves a residual
                    # that compounds into weight blow-up.
                    f = _sat_sigmoid(np.einsum("ij,ij->i", h, cx))
                    gp = (lr * (1.0 - f))[:, None]
                    grad_h += gp * cx
                    np.add.at(s1, x, gp * h)
                    # negatives: deterministic draws off the unigram^0.75 cdf
                    for k in range(negatives):
                        hh = (
                            c * _A + x * _B + (k + lo) * _C
                            + (seed + it + ep) * _D
                        ) % WALK_HASH_M
                        neg = np.minimum(
                            np.searchsorted(cdf, (hh + 1) / (WALK_HASH_M + 1)), n - 1
                        )
                        live = neg != x
                        cn = s1[neg]
                        f = _sat_sigmoid(np.einsum("ij,ij->i", h, cn))
                        gn = np.where(live, lr * (0.0 - f), 0.0)[:, None]
                        grad_h += gn * cn
                        np.add.at(s1, neg, gn * h)
                    np.add.at(s0, c, grad_h)
            ids = np.arange(n, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "w": np.full(n, float(count)),
                    "vec": [
                        np.concatenate([s0[i], s1[i]]).astype(float) * count
                        for i in ids
                    ],
                }
            )

        parts = pair_df.mapInPandas(train, schema="id long, w double, vec array<double>")
        avg = (
            parts.groupBy("id")
            .agg(
                (
                    F.aggregate(
                        F.collect_list("vec"),
                        F.array_repeat(F.lit(0.0), 2 * dim),
                        lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
                    )
                ).alias("sum_vec"),
                F.sum("w").alias("sw"),
            )
            .select("id", F.transform("sum_vec", lambda x: x / F.col("sw")).alias("vec"))
        )
        if it < iterations - 1:
            # Next iteration warm-starts every replica from the average:
            # collect the vocab-sized model once per iteration (same
            # driver footprint as the broadcast it feeds).
            rows = avg.collect()
            s0 = np.zeros((n, dim), dtype=np.float64)
            s1 = np.zeros((n, dim), dtype=np.float64)
            for r in rows:
                v = np.asarray(r["vec"], dtype=np.float64)
                s0[int(r["id"])] = v[:dim]
                s1[int(r["id"])] = v[dim:]
            syn0 = (s0, s1)
        else:
            final = avg.select(
                "id",
                F.slice("vec", 1, dim).cast("array<float>").alias("vector"),
            )

    return truncate(final)


@dataclass
class Node2VecResult:
    features: DataFrame  # (id: long, vector: array<float>), n rows
    walks: DataFrame  # the corpus the features were trained on


def node2vec(
    graph: Graph,
    P: float = 1.0,
    Q: float = 1.0,
    L: int = 80,
    N: int = 10,
    D: int = 128,
    window: int = 10,
    iterations: int = 1,
    local_epochs: int = 1,
    lr: float = 0.025,
    seed: int = 1,
) -> Node2VecResult:
    """Full pipeline with the reference's signature and defaults
    (Node2Vec.hpp: P=1, Q=1, L=80, N=10, D=128; run() uses winSize=10,
    iterations=1 — Node2Vec.cpp:64-66)."""
    n = _validate(graph)
    walks = truncate(
        biased_random_walks(
            graph, p=P, q=Q, walk_length=L, walks_per_node=N, seed=seed
        )
    )
    pairs = skipgram_pairs(walks, window=window)
    features = learn_embeddings(
        pairs, n=n, dim=D, iterations=iterations, local_epochs=local_epochs,
        lr=lr, seed=seed,
    )
    return Node2VecResult(features=features, walks=walks)
