"""Round-2.4 generators: Watts–Strogatz, Dorogovtsev–Mendes, Chung–Lu,
stochastic blockmodel, ring lattice, power-law degree sequences —
seeded determinism + the structural invariants each reference generator
guarantees (cpp/generators/*.cpp)."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from networkit_spark.generators import (
    chung_lu,
    dorogovtsev_mendes,
    powerlaw_degree_sequence,
    powerlaw_expected_average,
    powerlaw_minimum_from_average,
    regular_ring_lattice,
    stochastic_blockmodel,
    watts_strogatz,
)


def _pairs(df):
    return sorted((r["src"], r["dst"]) for r in df.collect())


def test_ring_lattice(spark):
    n, k = 20, 3
    e = _pairs(regular_ring_lattice(spark, n, k))
    assert len(e) == n * k
    deg = Counter()
    for u, v in e:
        deg[u] += 1
        deg[v] += 1
    assert all(deg[u] == 2 * k for u in range(n))


def test_watts_strogatz_invariants(spark):
    n, k, p = 60, 3, 0.2
    e1 = _pairs(watts_strogatz(spark, n, k, p, seed=7))
    e2 = _pairs(watts_strogatz(spark, n, k, p, seed=7))
    assert e1 == e2, "seeded determinism"
    assert e1 != _pairs(watts_strogatz(spark, n, k, p, seed=8))
    assert len(e1) <= n * k
    assert len(e1) >= int(n * k * 0.9)  # collisions are rare
    assert all(u != v for u, v in e1)
    lattice = _pairs(watts_strogatz(spark, n, k, 0.0, seed=7))
    assert lattice == _pairs(regular_ring_lattice(spark, n, k))


@pytest.mark.parametrize("n", [3, 4, 25, 120])
def test_dorogovtsev_mendes(spark, n):
    e = _pairs(dorogovtsev_mendes(spark, n, seed=5))
    assert len(e) == 2 * n - 3
    assert len(set(e)) == len(e), "no duplicate edges"
    assert all(u != v for u, v in e)
    # connected: union-find
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in e:
        parent[find(u)] = find(v)
    assert len({find(x) for x in range(n)}) == 1
    # every node t >= 3 attaches to the two endpoints of one EARLIER edge
    adj = {t: set() for t in range(n)}
    for u, v in e:
        adj[max(u, v)].add(min(u, v))
    earlier_edges = {(u, v) for u, v in e}
    for t in range(3, n):
        nbrs = sorted(adj[t])
        assert len(nbrs) == 2
        assert (nbrs[0], nbrs[1]) in earlier_edges, \
            "the two attachment targets must themselves be an edge"
    assert _pairs(dorogovtsev_mendes(spark, n, seed=5)) == e


def test_chung_lu_expected_degrees(spark):
    weights = [10.0] * 50 + [2.0] * 150
    e = _pairs(chung_lu(spark, weights, seed=3))
    deg = Counter()
    for u, v in e:
        deg[u] += 1
        deg[v] += 1
    hi = sum(deg[u] for u in range(50)) / 50
    lo = sum(deg[u] for u in range(50, 200)) / 150
    # expected degrees ~ w(1 - w/S...): generous 40% tolerance bands
    assert 6.0 <= hi <= 14.0
    assert 1.2 <= lo <= 2.8
    assert e == _pairs(chung_lu(weights=weights, spark=spark, seed=3))


def test_stochastic_blockmodel(spark):
    n = 120
    membership = [0] * 60 + [1] * 60
    probs = [[0.3, 0.01], [0.01, 0.3]]
    e = _pairs(stochastic_blockmodel(spark, n, 2, membership, probs, seed=9))
    intra = sum(1 for u, v in e if (u < 60) == (v < 60))
    inter = len(e) - intra
    # E[intra] = 2*C(60,2)*0.3 = 1062, E[inter] = 3600*0.01 = 36
    assert 850 <= intra <= 1280
    assert inter <= 90
    assert e == _pairs(stochastic_blockmodel(spark, n, 2, membership, probs, seed=9))


def test_powerlaw_sequence(spark):
    rows = powerlaw_degree_sequence(spark, 4000, -2.5, 2, 60, seed=4).collect()
    degs = [r["degree"] for r in rows]
    assert min(degs) >= 2 and max(degs) <= 60
    avg = sum(degs) / len(degs)
    # exact expectation of the generator's floored continuous Pareto
    # (the documented relaxation of the discrete zeta distribution)
    a = 2.5
    lo, hi = 2 ** (1 - a), 61 ** (1 - a)
    pmass = {d: ((d + 1) ** (1 - a) - d ** (1 - a)) / (hi - lo)
             for d in range(2, 61)}
    want_cont = sum(d * p for d, p in pmass.items())
    assert abs(avg - want_cont) < 0.3
    # and the discrete zeta target is in the same regime (sanity)
    want_disc = powerlaw_expected_average(-2.5, 2, 60)
    assert abs(want_cont - want_disc) < 1.0
    xm = powerlaw_minimum_from_average(want_disc, -2.5, 60)
    assert xm <= 2  # the fitted minimum reproduces the input regime
    assert powerlaw_expected_average(-2.5, xm, 60) >= want_disc - 1e-9 or xm == 60
