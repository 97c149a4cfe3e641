"""Single-node numpy oracle for PageRank, implementing the reference
semantics exactly (networkit/cpp/centrality/PageRank.cpp:21-128).

Input: directed edge list over nodes 0..n-1 (undirected graphs must be
passed pre-symmetrized with self-loops once, matching the engine's message
table). Independent implementation — used to verify the Spark engine at
allclose(1e-6)."""

from __future__ import annotations

import numpy as np

NO_SINK_HANDLING = "no_sink_handling"
DISTRIBUTE_SINKS = "distribute_sinks"


def pagerank_oracle(
    n: int,
    edges: list[tuple[int, int, float]],
    damp: float = 0.85,
    tol: float = 1e-8,
    normalized: bool = False,
    distribute_sinks: str = NO_SINK_HANDLING,
    norm: str = "l2",
    max_iterations: int | None = None,
    directed: bool = True,
) -> tuple[np.ndarray, int]:
    """Returns (scores[n], iterations)."""
    max_iter = max_iterations if max_iterations is not None else 2**31
    src = np.array([e[0] for e in edges], dtype=np.int64)
    dst = np.array([e[1] for e in edges], dtype=np.int64)
    w = np.array([e[2] if len(e) > 2 else 1.0 for e in edges], dtype=np.float64)

    deg = np.zeros(n)  # weightedDegree (out) — PageRank.cpp:31-32
    np.add.at(deg, src, w)

    handle_sinks = directed and (distribute_sinks == DISTRIBUTE_SINKS or normalized)
    sinks = np.where(deg == 0)[0] if handle_sinks else np.array([], dtype=np.int64)

    teleport = (1.0 - damp) / n
    factor = damp / n
    score = np.full(n, 1.0 / n)
    iterations = 0

    # contribution fraction per edge, fixed across supersteps
    frac = w / deg[src]

    while True:
        pr = np.zeros(n)
        np.add.at(pr, dst, score[src] * frac)  # pull over in-edges (:70-75)
        pr = pr * damp + teleport
        if handle_sinks:
            pr += factor * score[sinks].sum()  # :84-91, from OLD scores
        iterations += 1
        if norm == "l2":
            diff = np.sqrt(((score - pr) ** 2).sum())
        else:
            diff = np.abs(score - pr).sum()
        score = pr
        if iterations >= max_iter or diff <= tol:  # :53-63 order
            break

    # post-processing (:100-123)
    if normalized:
        if directed:
            norm_factor = (1.0 / n) * ((1.0 - damp) + damp * score[sinks].sum())
        else:
            norm_factor = teleport
        score = score / norm_factor
    elif directed and distribute_sinks == NO_SINK_HANDLING:
        score = score / score.sum()
    return score, iterations
