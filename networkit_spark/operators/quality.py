"""Partition quality measures + clustering predicates as aggregate queries.

Reference semantics:
- Modularity (networkit/cpp/community/Modularity.cpp:23-90):
    Q = coverage − Σ_C (vol_C / (2m))²
  where coverage = intra-cluster edge weight / total edge weight, m =
  total edge weight (each undirected edge once), vol_C = Σ_{v∈C}
  weightedDegree(v) with self-loop weight counted TWICE
  (Modularity.cpp:56 — volume adds w(v,v) again).
- Coverage (networkit/cpp/community/Coverage.cpp): the coverage term alone.
- GraphClusteringTools::equalClusterings (networkit/cpp/community/
  GraphClusteringTools.cpp:102-116): two clusterings are equal iff they
  induce the same co-membership relation over all edges.
- isProperClustering: every node has exactly one label.

All are single-pass joins + aggregations — no iteration, Catalyst fuses
the degree computation and the label joins into a few shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from networkit_spark.graph import Graph
from networkit_spark.plans import local_guard


def _edge_labels(graph: Graph, labels: DataFrame) -> DataFrame:
    """Each undirected edge once with both endpoint labels (+ weight)."""
    und = (
        graph.symmetrized_edges()
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            "weight",
        )
        .dropDuplicates(["u", "v"])
    )
    lu = labels.select(F.col("id").alias("u"), F.col("label").alias("lu"))
    lv = labels.select(F.col("id").alias("v"), F.col("label").alias("lv"))
    return und.join(lu, "u").join(lv, "v")


def coverage(graph: Graph, labels: DataFrame) -> float:
    """Fraction of edge weight inside clusters (Coverage.cpp)."""
    el = _edge_labels(graph, labels)
    row = el.agg(
        F.sum(F.when(F.col("lu") == F.col("lv"), F.col("weight"))).alias("intra"),
        F.sum("weight").alias("total"),
    ).first()
    return (row["intra"] or 0.0) / row["total"]


def modularity(graph: Graph, labels: DataFrame) -> float:
    """Q = coverage − Σ_C (vol_C / (2m))² (Modularity.cpp:44-82)."""
    el = _edge_labels(graph, labels)
    row = el.agg(
        F.sum(F.when(F.col("lu") == F.col("lv"), F.col("weight"))).alias("intra"),
        F.sum("weight").alias("total"),
    ).first()
    intra, m = (row["intra"] or 0.0), row["total"]

    # vol_C: weightedDegree per node (self-loops twice) summed per label.
    deg = graph.symmetrized_edges().groupBy(F.col("src").alias("id")).agg(
        (
            F.sum("weight")
            + F.sum(F.when(F.col("src") == F.col("dst"), F.col("weight")).otherwise(0.0))
        ).alias("vol")
    )
    vols = (
        labels.join(deg, "id", "left")
        .groupBy("label")
        .agg(F.sum(F.coalesce("vol", F.lit(0.0))).alias("vol_c"))
    )
    expected = vols.agg(
        F.sum(F.pow(F.col("vol_c") / (2.0 * m), 2)).alias("e")
    ).first()["e"]
    return intra / m - expected


def is_proper_clustering(graph: Graph, labels: DataFrame) -> bool:
    """Every vertex appears exactly once with a non-null label."""
    v = graph.vertices()
    joined = v.join(labels, "id", "left")
    bad = joined.filter(F.col("label").isNull()).count()
    dup = labels.groupBy("id").count().filter("count > 1").count()
    return bad == 0 and dup == 0 and labels.count() == v.count()


def is_singleton_clustering(labels: DataFrame) -> bool:
    return (
        labels.select("label").distinct().count() == labels.count()
    )


def is_one_clustering(labels: DataFrame) -> bool:
    return labels.select("label").distinct().count() == 1


def equal_clusterings(graph: Graph, a: DataFrame, b: DataFrame) -> bool:
    """Same co-membership over all edges (GraphClusteringTools.cpp:102-116)."""
    ab = a.select("id", F.col("label").alias("la")).join(
        b.select("id", F.col("label").alias("lb")), "id"
    )
    el = (
        graph.symmetrized_edges()
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") < F.col("v"))
        .dropDuplicates(["u", "v"])
    )
    u = ab.select(F.col("id").alias("u"), F.col("la").alias("lau"), F.col("lb").alias("lbu"))
    v = ab.select(F.col("id").alias("v"), F.col("la").alias("lav"), F.col("lb").alias("lbv"))
    joined = el.join(u, "u").join(v, "v")
    mismatch = joined.filter(
        (F.col("lau") == F.col("lav")) != (F.col("lbu") == F.col("lbv"))
    ).count()
    return mismatch == 0


def nmi(labels_a: DataFrame, labels_b: DataFrame) -> float:
    """Normalized mutual information between two clusterings of the same
    node set (reference: networkit/cpp/community/NMIDistance.cpp — which
    reports the DISTANCE 1−NMI; this returns NMI itself, arithmetic-mean
    normalization NMI = 2·I(A;B)/(H(A)+H(B))).

    One shuffle: the joint contingency counts n_ij via groupBy; the
    marginals re-aggregate from the (≤ |A|·|B|-cell, typically tiny)
    joint table, and the entropy sums reduce to scalars."""
    joint = (
        labels_a.select("id", F.col("label").alias("la"))
        .join(labels_b.select("id", F.col("label").alias("lb")), "id")
        .groupBy("la", "lb")
        .agg(F.count(F.lit(1)).alias("nij"))
        .persist()
    )
    stats = joint.agg(
        F.sum("nij").alias("n"), F.count(F.lit(1)).alias("cells")
    ).first()
    n, cells = stats["n"], int(stats["cells"])
    if not n:
        joint.unpersist()
        return 0.0
    # The contingency table is cell-count-sized (≤ #nonempty (A,B) label
    # pairs, ≪ nodes once either clustering has real communities). When
    # it fits the driver budget, finish the entropies in ONE collect +
    # numpy instead of three more scalar-aggregation jobs; the
    # distributed path below stays as the unguarded-scale fallback.
    if cells * 24 <= local_guard.DEFAULT_MAX_LOCAL_BYTES:
        import numpy as np

        rows = joint.collect()
        joint.unpersist()
        nij = np.array([r["nij"] for r in rows], dtype="float64")
        la = np.array([r["la"] for r in rows])
        lb = np.array([r["lb"] for r in rows])
        _, ia = np.unique(la, return_inverse=True)
        _, ib = np.unique(lb, return_inverse=True)
        ni = np.bincount(ia, weights=nij)
        nj = np.bincount(ib, weights=nij)
        ha = float(-np.sum((ni / n) * np.log(ni / n)))
        hb = float(-np.sum((nj / n) * np.log(nj / n)))
        mi = float(
            np.sum((nij / n) * np.log(n * nij / (ni[ia] * nj[ib])))
        )
        if ha + hb == 0:
            return 1.0
        return 2.0 * mi / (ha + hb)
    na = joint.groupBy("la").agg(F.sum("nij").alias("ni"))
    nb = joint.groupBy("lb").agg(F.sum("nij").alias("nj"))
    ha = float(
        na.agg(-F.sum((F.col("ni") / n) * F.log(F.col("ni") / n))).first()[0]
    )
    hb = float(
        nb.agg(-F.sum((F.col("nj") / n) * F.log(F.col("nj") / n))).first()[0]
    )
    mi = float(
        joint.join(na, "la")
        .join(nb, "lb")
        .agg(
            F.sum(
                (F.col("nij") / n)
                * F.log(n * F.col("nij") / (F.col("ni") * F.col("nj")))
            )
        )
        .first()[0]
    )
    joint.unpersist()
    if ha + hb == 0:
        return 1.0  # both one-clusterings: identical
    return 2.0 * mi / (ha + hb)


def dynamic_nmi_distance(
    old_labels: DataFrame, new_labels: DataFrame
) -> float:
    """DynamicNMIDistance.cpp:27-187 — NMI distance between a partition
    and its successor after the graph changed: NMID = 1 − 2·MI/(H_old +
    H_new) computed over the nodes present in BOTH partitions
    (isInBoth, :17-22 — exactly the inner join inside `nmi`, whose
    marginals re-aggregate from the joint table and therefore count
    only overlap nodes, matching size_old/size_new at :42-49). H_old +
    H_new = 0 → NMID = 0 (combineValues, :129-136; `nmi` returns 1
    there), and the result is clamped to [0, 1] (sanityCheck,
    :164-187)."""
    d = 1.0 - nmi(old_labels, new_labels)
    return min(1.0, max(0.0, d))


# ----------------------------------------------- ClusteringGenerator.cpp
def make_singleton_clustering(graph: Graph) -> DataFrame:
    """(id, label) — every node its own cluster."""
    return graph.vertices().select("id", F.col("id").alias("label"))


def make_one_clustering(graph: Graph) -> DataFrame:
    """(id, label) — one cluster."""
    return graph.vertices().select("id", F.lit(0).cast("long").alias("label"))


def make_random_clustering(graph: Graph, k: int, seed: int = 1) -> DataFrame:
    """(id, label) — uniform hash assignment to k clusters
    (ClusteringGenerator.cpp:29-46; the reference warns when fewer than
    k land non-empty, same here by construction)."""
    return graph.vertices().select(
        "id", (F.abs(F.xxhash64(F.lit(seed), F.col("id"))) % k).alias("label")
    )


def make_continuous_balanced_clustering(graph: Graph, k: int) -> DataFrame:
    """(id, label) — contiguous id-rank blocks of size n/k (±1)
    (ClusteringGenerator.cpp:48-75): block b holds ranks
    [b·n/k-ish prefix) — computed from the rank, no driver loop."""
    from networkit_spark.plans.ranking import global_row_numbers

    n = graph.num_vertices()
    ranked = global_row_numbers(graph.vertices(), "id", "rk")
    # rank r belongs to block b iff r < prefix(b+1); with block sizes
    # n/k + (n%k > b) the prefix is b*(n//k) + min(b, n%k), inverted:
    q, rem = divmod(n, k)
    # ranks < rem*(q+1) are in the (q+1)-sized blocks
    label = F.when(
        F.col("rk") < rem * (q + 1), F.floor(F.col("rk") / (q + 1))
    ).otherwise(rem + F.floor((F.col("rk") - rem * (q + 1)) / max(q, 1)))
    return ranked.select("id", label.cast("long").alias("label"))


def make_noncontinuous_balanced_clustering(graph: Graph, k: int) -> DataFrame:
    """(id, label) — round-robin by id rank
    (ClusteringGenerator.cpp:76-90)."""
    from networkit_spark.plans.ranking import global_row_numbers

    ranked = global_row_numbers(graph.vertices(), "id", "rk")
    return ranked.select("id", (F.col("rk") % k).alias("label"))
