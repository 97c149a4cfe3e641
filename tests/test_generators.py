"""Distributed generators: determinism, expected structure, skew shape."""

from pyspark.sql import functions as F

from networkit_spark.generators import erdos_renyi, planted_partition, rmat
from networkit_spark.graph import Graph
from networkit_spark.operators.components import connected_components


def test_er_deterministic(spark):
    a = erdos_renyi(spark, 50, 0.1, seed=1)
    b = erdos_renyi(spark, 50, 0.1, seed=1)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    c = erdos_renyi(spark, 50, 0.1, seed=2)
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, c.collect()))


def test_er_edge_probability(spark):
    n, p = 100, 0.1
    m = erdos_renyi(spark, n, p, seed=3).count()
    expect = p * n * (n - 1) / 2
    assert 0.7 * expect < m < 1.3 * expect


def test_planted_cliques_components(spark):
    e = planted_partition(spark, 60, 3, p_intra=1.0, p_inter=0.0, seed=4)
    assert e.count() == 3 * 20 * 19 // 2
    g = Graph.from_edges(e, directed=False)
    assert connected_components(g).number_of_components() == 3


def test_rmat_shape(spark):
    df = rmat(spark, scale=8, edge_factor=4, seed=5)
    n = 1 << 8
    assert df.count() == n * 4
    mx = df.agg(F.max("src"), F.max("dst")).first()
    assert mx[0] < n and mx[1] < n
    # power-law-ish: the hottest vertex has far more than mean degree
    top = (
        df.groupBy("src").count().agg(F.max("count")).first()[0]
    )
    assert top > 4 * 4  # mean out-degree is 4


def test_rmat_deterministic(spark):
    a = rmat(spark, scale=6, edge_factor=2, seed=7).collect()
    b = rmat(spark, scale=6, edge_factor=2, seed=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------- BA/LFR
from networkit_spark.generators import barabasi_albert, lfr
from networkit_spark.operators.quality import nmi


def test_ba_deterministic(spark):
    a = barabasi_albert(spark, k=2, n_max=60, seed=11).collect()
    b = barabasi_albert(spark, k=2, n_max=60, seed=11).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = barabasi_albert(spark, k=2, n_max=60, seed=12).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_ba_shape_and_connectivity(spark):
    k, n = 3, 120
    e = barabasi_albert(spark, k=k, n_max=n, seed=13)
    rows = e.collect()
    # canonical orientation, node ids within range, attachment count bound
    assert all(r.src < r.dst for r in rows)
    assert max(max(r.src, r.dst) for r in rows) == n - 1
    assert len(rows) <= k + k * (n - k)
    # preferential attachment concentrates degree: some hub well over k
    g = Graph.from_edges(e, directed=False)
    assert connected_components(g).number_of_components() == 1
    deg = {}
    for r in rows:
        deg[r.src] = deg.get(r.src, 0) + 1
        deg[r.dst] = deg.get(r.dst, 0) + 1
    assert max(deg.values()) > 3 * k


def test_ba_attaches_to_earlier_nodes(spark):
    # every non-seed edge connects a new node to a strictly earlier one
    k, n = 2, 80
    rows = barabasi_albert(spark, k=k, n_max=n, seed=14).collect()
    for r in rows:
        assert r.src < r.dst  # new node is always the larger id


def test_lfr_membership_partitions_nodes(spark):
    edges, comm = lfr(spark, 400, seed=21)
    ids = [r.id for r in comm.collect()]
    assert sorted(ids) == list(range(400))
    sizes = comm.groupBy("community").count().collect()
    # all but the clipped last community respect the declared bounds
    in_bounds = [r["count"] for r in sizes if 20 <= r["count"] <= 100]
    assert len(in_bounds) >= len(sizes) - 1


def test_lfr_deterministic_and_degree_bounded(spark):
    e1, _ = lfr(spark, 300, seed=22)
    e2, _ = lfr(spark, 300, seed=22)
    assert sorted(map(tuple, e1.collect())) == sorted(map(tuple, e2.collect()))
    deg = (
        e1.select(F.col("src").alias("id"))
        .unionAll(e1.select(F.col("dst").alias("id")))
        .groupBy("id").count().agg(F.max("count")).first()[0]
    )
    assert deg <= 50  # realized degree never exceeds the drawn power-law cap


def test_lfr_mixing_fraction(spark):
    mu = 0.2
    edges, comm = lfr(spark, 600, mu=mu, seed=23)
    cu = comm.select(F.col("id").alias("src"), F.col("community").alias("cu"))
    cv = comm.select(F.col("id").alias("dst"), F.col("community").alias("cv"))
    tagged = edges.join(cu, "src").join(cv, "dst")
    m = tagged.count()
    inter = tagged.filter(F.col("cu") != F.col("cv")).count()
    # inter-bucket pairing can still land inside a community by chance,
    # and dedup/self-pair drops skew both sides: wide tolerance
    assert 0.4 * mu < inter / m < 2.0 * mu


def test_plm_recovers_lfr_communities(spark):
    from networkit_spark.operators.plm import plm

    edges, truth = lfr(spark, 500, mu=0.05, seed=24)
    g = Graph.from_edges(edges, directed=False)
    labels = plm(g).labels
    score = nmi(labels, truth.withColumnRenamed("community", "label"))
    assert score > 0.7


def test_nmi_identity_permutation_independence(spark):
    truth = spark.range(200).select(
        "id", (F.col("id") % 4).alias("label")
    )
    assert abs(nmi(truth, truth) - 1.0) < 1e-9
    permuted = truth.select("id", ((F.col("label") + 1) % 4).alias("label"))
    assert abs(nmi(truth, permuted) - 1.0) < 1e-9
    # labels independent of truth -> NMI near 0
    other = spark.range(200).select(
        "id", F.pmod(F.xxhash64("id"), F.lit(4)).alias("label")
    )
    assert nmi(truth, other) < 0.1


def test_hyperbolic_blocking_is_complete(spark):
    """The two-zone candidate blocking must not drop edges: with
    core_frac=1.0 every point is core and the realization degenerates to
    the exact all-pairs filter — the blocked edge set must equal it."""
    from networkit_spark.generators import hyperbolic

    blocked = sorted(
        (r.src, r.dst) for r in hyperbolic(spark, 300, avg_degree=6.0).collect()
    )
    allpairs = sorted(
        (r.src, r.dst)
        for r in hyperbolic(spark, 300, avg_degree=6.0, core_frac=1.0).collect()
    )
    assert blocked == allpairs
    assert len(blocked) > 0


def test_hyperbolic_degree_shape(spark):
    """Realized average degree lands within a factor of the closed-form
    target; the degree distribution is heavy-tailed (hub >> mean)."""
    from networkit_spark.generators import hyperbolic

    n = 1000
    edges = hyperbolic(spark, n, avg_degree=8.0, seed=3)
    m = edges.count()
    avg = 2.0 * m / n
    assert 8.0 / 3 < avg < 8.0 * 3
    deg = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .count()
    )
    assert deg.agg(F.max("count")).first()[0] > 5 * avg


def test_hyperbolic_deterministic(spark):
    from networkit_spark.generators import hyperbolic

    a = sorted(map(tuple, hyperbolic(spark, 200, seed=9).collect()))
    b = sorted(map(tuple, hyperbolic(spark, 200, seed=9).collect()))
    assert a == b


def test_hyperbolic_soft_t_zero_equals_threshold(spark):
    """T=0 must branch to the threshold generator exactly
    (HyperbolicGenerator.cpp:203-204 generateCold)."""
    from networkit_spark.generators import hyperbolic, hyperbolic_soft

    a = sorted((r.src, r.dst) for r in hyperbolic(spark, 200, seed=4).collect())
    b = sorted(
        (r.src, r.dst)
        for r in hyperbolic_soft(spark, 200, T=0.0, seed=4).collect()
    )
    assert a == b


def test_hyperbolic_soft_negative_t_raises(spark):
    from networkit_spark.generators import hyperbolic_soft

    import pytest as _pytest
    with _pytest.raises(ValueError, match="Temperature cannot be negative"):
        hyperbolic_soft(spark, 50, T=-0.1)


def test_hyperbolic_soft_calibration_and_monotonicity(spark):
    """Realized edge count matches the Fermi–Dirac expectation over the
    candidate band (binomial tolerance), sub-threshold pairs DO occur
    (impossible at T=0), and determinism holds."""
    import math

    from pyspark.sql import functions as F
    from networkit_spark.generators import (
        hyperbolic_points,
        hyperbolic_soft,
        hyperbolic_soft_edges_from_points,
    )

    n, T, seed = 400, 0.2, 11
    gamma, avg_degree = 3.0, 6.0
    alpha = (gamma - 1.0) / 2.0
    R = 2.0 * math.log(8.0 * n / (math.pi * avg_degree))
    pts = hyperbolic_points(spark, n, alpha, R, seed).collect()
    coords = {r["id"]: (r["theta"], r["r"]) for r in pts}

    edges = hyperbolic_soft(spark, n, T=T, seed=seed).collect()
    got = {(r.src, r.dst) for r in edges}

    # brute-force expectation over ALL pairs
    exp_edges = 0.0
    var = 0.0
    long_pairs = 0
    for i in range(n):
        ti, ri = coords[i]
        for j in range(i + 1, n):
            tj, rj = coords[j]
            coshd = math.cosh(ri) * math.cosh(rj) - math.sinh(ri) * math.sinh(
                rj
            ) * math.cos(ti - tj)
            d = math.acosh(max(coshd, 1.0))
            p = 1.0 / (math.exp((d - R) / (2.0 * T)) + 1.0)
            exp_edges += p
            var += p * (1.0 - p)
    sd = math.sqrt(var)
    assert abs(len(got) - exp_edges) < 5.0 * sd + 1.0

    # some realized edges are LONGER than the threshold R (T>0 feature)
    for (u, v) in got:
        tu, ru = coords[u]
        tv, rv = coords[v]
        coshd = math.cosh(ru) * math.cosh(rv) - math.sinh(ru) * math.sinh(
            rv
        ) * math.cos(tu - tv)
        if coshd > math.cosh(R):
            long_pairs += 1
    assert long_pairs > 0

    again = {
        (r.src, r.dst)
        for r in hyperbolic_soft(spark, n, T=T, seed=seed).collect()
    }
    assert again == got
