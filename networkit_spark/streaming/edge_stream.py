"""Structured-Streaming analogs of the reference's dynamic-graph layer.

Reference: networkit/cpp/dynamics/ (GraphEvent streams: edge additions /
removals consumed by DynConnectedComponents etc., DGS reader in
graphio). The Spark-native mapping (SURVEY.md §2.5 streaming row):

- an edge-event stream is just a streaming DataFrame
  (ts, src, dst, weight, op) — readStream from any source;
- windowed edge statistics = watermark + window aggregation (stateful,
  incremental, late-data tolerant);
- incremental connected components = foreachBatch: each micro-batch's
  new edges are unioned into the durable edge table and hash-min CC is
  re-run WARM-STARTED from the previous labels (labels only ever
  decrease when edges are added, so the previous fixed point is a valid
  initialization — supersteps needed per batch ≈ how far the new edges
  moved the frontier, not the graph diameter).

Deletions (the reference DynCC's repair step,
cpp/components/DynConnectedComponents.cpp) map to LOCALIZED recompute:
a removed edge can only split the component it lived in, so the batch
resets every vertex of TOUCHED components to a singleton label and
re-runs warm-started hash-min — unaffected components sit at their fixed
point and never re-enter the frontier, so the repair cost scales with
the touched components' size, not the graph (the distributed analog of
DynCC's bounded BFS repair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans.iterative import truncate
from networkit_spark.operators.components import connected_components


def edge_events_from_stream(stream: DataFrame, ts_col: str = "ts",
                            watermark: str = "1 hour") -> DataFrame:
    """Normalize a raw event stream to (ts, src, dst, weight) with a
    watermark for stateful ops downstream."""
    return (
        stream.select(
            F.col(ts_col).alias("ts"),
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            F.coalesce(F.col("weight"), F.lit(1.0)).cast("double").alias("weight"),
        )
        .withWatermark("ts", watermark)
    )


def windowed_edge_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Per-window, per-src edge counts — the streaming degree table.
    Works on both batch and streaming DataFrames (same plan)."""
    return (
        events.groupBy(F.window("ts", window).alias("win"), "src")
        .agg(F.count("*").cast("long").alias("n_edges"),
             F.sum("weight").alias("w_degree"))
        .select(F.col("win.start").alias("window_start"), "src", "n_edges", "w_degree")
    )


class incremental_connected_components:
    """foreachBatch sink maintaining CC labels over an append-only edge
    stream.

    Usage:
        icc = incremental_connected_components(spark)
        q = (events.writeStream.foreachBatch(icc).outputMode("update").start())
        ... icc.labels  # current labels DataFrame after each batch

    Warm start: each batch initializes labels to the previous fixed point
    for existing vertices (new vertices start as singletons); hash-min
    then only propagates the effect of the new edges.
    """

    def __init__(self, spark, num_partitions: int | None = None):
        self.spark = spark
        self.num_partitions = num_partitions
        self.edges: DataFrame | None = None
        self.labels: DataFrame | None = None
        self.batches = 0
        self.history: list[dict] = []

    def __call__(self, batch_df: DataFrame, batch_id: int):
        has_ops = "op" in batch_df.columns
        adds = batch_df.filter(F.col("op") != "del") if has_ops else batch_df
        dels = batch_df.filter(F.col("op") == "del") if has_ops else None

        new_edges = adds.select("src", "dst").withColumn("weight", F.lit(1.0))
        if self.edges is None:
            self.edges = new_edges.transform(truncate)
        else:
            self.edges = truncate(
                self.edges.unionByName(new_edges).dropDuplicates(["src", "dst"]),
                release=self.edges,
            )

        init = self.labels
        if dels is not None:
            # remove both stored orientations of each deleted edge
            pairs = dels.select("src", "dst")
            pairs = pairs.unionByName(
                pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            self.edges = truncate(
                self.edges.join(pairs, ["src", "dst"], "left_anti"),
                release=self.edges,
            )
            if init is not None:
                # DynCC repair: a deletion can only split its own
                # component — reset every vertex of TOUCHED components to
                # a singleton; all other components stay at their fixed
                # point (stale labels there remain valid warm starts).
                endpoints = (
                    dels.select(F.col("src").alias("id"))
                    .unionByName(dels.select(F.col("dst").alias("id")))
                    .distinct()
                )
                touched = (
                    init.join(endpoints, "id", "left_semi")
                    .select("label")
                    .distinct()
                )
                init = init.join(touched, "label", "left_semi").select(
                    "id", F.col("id").alias("label")
                ).unionByName(
                    init.join(touched, "label", "left_anti").select("id", "label")
                )

        g = Graph.from_edges(self.edges, directed=False,
                             num_partitions=self.num_partitions)
        # warm start from the previous fixed point (new vertices fall back
        # to singleton labels inside connected_components)
        res = connected_components(g, initial_labels=init)
        self.labels = truncate(res.labels, release=self.labels)
        self.batches += 1
        self.history.append({"batch": int(batch_id), "supersteps": res.iterations})


def _canonical_pairs(df: DataFrame) -> DataFrame:
    """Distinct undirected pairs (u < v), self-loops dropped."""
    return (
        df.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _triangle_delta(new: DataFrame, old: DataFrame) -> int:
    """Triangles containing >= 1 edge of `new` in the graph old ∪ new
    (both canonical u < v pair tables, disjoint). Decomposed by how many
    new edges the triangle uses, so each is counted exactly once:

      T1 (one new edge):   per new edge, common neighbors in OLD
      T2 (two new edges):  wedges of two new edges closed by an OLD edge
      T3 (three new):      triangles inside `new`

    This is the standard dynamic triangle-maintenance decomposition
    (the same counting DynTriangleCounting-style updates use); each term
    is one or two joins, all JVM-side.
    """
    old_arcs = old.select(F.col("u").alias("s"), F.col("v").alias("d")).unionByName(
        old.select(F.col("v").alias("s"), F.col("u").alias("d"))
    )
    new_arcs = new.select(F.col("u").alias("s"), F.col("v").alias("d")).unionByName(
        new.select(F.col("v").alias("s"), F.col("u").alias("d"))
    )
    t1 = (
        new.join(
            old_arcs.select(F.col("s").alias("u"), F.col("d").alias("w")), "u"
        )
        .join(
            old_arcs.select(F.col("s").alias("v"), F.col("d").alias("w")),
            ["v", "w"],
        )
        .count()
    )
    wedges = (
        new_arcs.alias("a")
        .join(new_arcs.alias("b"), F.col("a.s") == F.col("b.s"))
        .filter(F.col("a.d") < F.col("b.d"))
        .select(F.col("a.d").alias("u"), F.col("b.d").alias("v"))
    )
    t2 = wedges.join(old, ["u", "v"], "left_semi").count()
    t3 = (
        new.alias("x")
        .join(new.alias("y"), F.col("x.v") == F.col("y.u"))
        .join(
            new.alias("z"),
            (F.col("z.u") == F.col("x.u")) & (F.col("z.v") == F.col("y.v")),
            "left_semi",
        )
        .count()
    )
    return t1 + t2 + t3


class incremental_triangle_count:
    """foreachBatch sink maintaining the GLOBAL triangle count over an
    edge stream with adds (and optional `op = 'del'` deletions) —
    the dynamic-triangle-counting analog of
    incremental_connected_components. Per batch the work is the batch's
    neighborhood joins (never a full recount): additions count the new
    triangles against the pre-add state; deletions count the lost
    triangles against the post-remove state with the same decomposition
    (a deleted triangle contains >= 1 deleted edge)."""

    def __init__(self, spark):
        self.spark = spark
        self.edges: DataFrame | None = None  # canonical (u, v), u < v
        self.total = 0
        self.batches = 0
        self.history: list[dict] = []

    def __call__(self, batch_df: DataFrame, batch_id: int):
        has_ops = "op" in batch_df.columns
        adds = batch_df.filter(F.col("op") != "del") if has_ops else batch_df
        dels = batch_df.filter(F.col("op") == "del") if has_ops else None

        if self.edges is None:
            empty = _canonical_pairs(adds).filter(F.lit(False))
            self.edges = empty.transform(truncate)

        if dels is not None:
            gone = _canonical_pairs(dels).join(self.edges, ["u", "v"], "left_semi")
            rest = self.edges.join(gone, ["u", "v"], "left_anti")
            rest = truncate(rest, release=self.edges)
            self.total -= _triangle_delta(gone, rest)
            self.edges = rest

        new = _canonical_pairs(adds).join(self.edges, ["u", "v"], "left_anti")
        self.total += _triangle_delta(new, self.edges)
        self.edges = truncate(
            self.edges.unionByName(new), release=self.edges
        )
        self.batches += 1
        self.history.append({"batch": int(batch_id), "total": self.total})
