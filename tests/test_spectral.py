"""Distributed spectra vs numpy (algebraic.py symmetricEigenvectors
contract: eigenvalues ascending, LA/SA ends) + SpectralColoring
validity (coloring.py recursion)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.operators.spectral import (
    adjacency_eigenvectors,
    fiedler_vector,
    laplacian_eigenvectors,
    spectral_coloring,
)

from tests.conftest import spark  # noqa: F401

PAIRS = [
    (0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (1, 4), (0, 5),
]
N = 6


def _dense(pairs, n):
    a = np.zeros((n, n))
    for u, v in pairs:
        a[u, v] = a[v, u] = 1.0
    return a


def _vec(df, j, n):
    rows = {r["id"]: r["x"] for r in df.filter(F.col("j") == j).collect()}
    return np.array([rows[i] for i in range(n)])


def test_adjacency_la_matches_numpy(spark):  # noqa: F811
    g = Graph.from_pairs(spark, PAIRS, directed=False, n=N)
    a = _dense(PAIRS, N)
    want = np.sort(np.linalg.eigvalsh(a))[-3:]  # top-3, ascending
    vals, vecs = adjacency_eigenvectors(g, 3)
    assert np.allclose(vals, want, atol=1e-6)
    # eigenvector residual ‖Av − λv‖ small for each returned pair
    for j, lam in enumerate(vals):
        v = _vec(vecs, j, N)
        assert np.linalg.norm(a @ v - lam * v) < 1e-5
        assert abs(np.linalg.norm(v) - 1.0) < 1e-6


def test_adjacency_sa_end(spark):  # noqa: F811
    g = Graph.from_pairs(spark, PAIRS, directed=False, n=N)
    a = _dense(PAIRS, N)
    want = np.sort(np.linalg.eigvalsh(a))[:2]  # bottom-2, ascending
    vals, _ = adjacency_eigenvectors(g, 2, reverse=True)
    assert np.allclose(vals, want, atol=1e-6)


def test_laplacian_fiedler(spark):  # noqa: F811
    g = Graph.from_pairs(spark, PAIRS, directed=False, n=N)
    a = _dense(PAIRS, N)
    lap = np.diag(a.sum(1)) - a
    want = np.sort(np.linalg.eigvalsh(lap))
    vals, vecs = laplacian_eigenvectors(g, 2, reverse=True)
    assert abs(vals[0]) < 1e-6  # λ₁ = 0 (connected)
    assert np.allclose(vals[1], want[1], atol=1e-6)
    lam2, fv = fiedler_vector(g)
    assert abs(lam2 - want[1]) < 1e-6
    # Fiedler vector ⊥ constant
    xs = np.array([r["x"] for r in fv.collect()])
    assert abs(xs.sum()) < 1e-6


def test_spectral_coloring_valid(spark):  # noqa: F811
    g = Graph.from_pairs(spark, PAIRS, directed=False, n=N)
    col = {r["id"]: r["color"] for r in spectral_coloring(g).collect()}
    assert set(col) == set(range(N))
    for u, v in PAIRS:
        assert col[u] != col[v]


def test_spectral_coloring_bipartite_two_colors(spark):  # noqa: F811
    # path 0-1-2-3-4: the most-negative adjacency eigenvector alternates
    # sign along the path, so ONE split yields a proper 2-coloring
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4)]
    g = Graph.from_pairs(spark, pairs, directed=False, n=5)
    col = {r["id"]: r["color"] for r in spectral_coloring(g, k=4).collect()}
    for u, v in pairs:
        assert col[u] != col[v]
    assert len(set(col.values())) == 2
