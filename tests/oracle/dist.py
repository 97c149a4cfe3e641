"""Single-node BFS-based oracles for the distance module (pure Python,
mirrors the reference's per-source BFS loops exactly)."""

from collections import deque


def adjacency(n: int, edges, directed: bool = False):
    adj = {v: [] for v in range(n)}
    for e in edges:
        u, v = e[0], e[1]
        adj[u].append(v)
        if not directed and u != v:
            adj[v].append(u)
    return adj


def bfs_dists(adj, s):
    dist = {s: 0}
    q = deque([s])
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def closeness_oracle(n, edges, normalized=False, variant="standard"):
    """Closeness.hpp:84-100 updateScoreData semantics."""
    adj = adjacency(n, edges)
    scores = {}
    for v in range(n):
        d = bfs_dists(adj, v)
        sum_d = float(sum(d.values()))
        reached = len(d)
        if sum_d > 0:
            if variant == "standard":
                s = 1.0 / sum_d
            else:
                s = (reached - 1) / sum_d / (n - 1)
        else:
            s = 0.0
        if normalized:
            s *= (n - 1) if variant == "standard" else (reached - 1)
        scores[v] = s
    return scores


def harmonic_oracle(n, edges, normalized=False):
    adj = adjacency(n, edges)
    scores = {}
    for v in range(n):
        d = bfs_dists(adj, v)
        s = sum(1.0 / x for x in d.values() if x > 0)
        scores[v] = s / (n - 1) if normalized else s
    return scores


def effective_diameter_oracle(n, edges, ratio=0.9):
    """EffectiveDiameter.cpp:28-92: per-node first h≥1 reaching the
    threshold; mean over nodes."""
    import math

    adj = adjacency(n, edges)
    threshold = math.ceil(ratio * n)
    total = 0
    for v in range(n):
        d = bfs_dists(adj, v)
        h = 1
        while sum(1 for x in d.values() if x <= h) < threshold:
            h += 1
        total += h
    return total / n
