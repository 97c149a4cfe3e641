"""Single-threaded synchronous label-propagation oracle mirroring the
engine's deterministic variant of PLP.cpp:77-96 (heaviest neighbor label,
ties to smallest label, isolated nodes keep their own label). Used only on
fixtures with unambiguous outcomes (planted cliques, self-loop singleton)."""

from __future__ import annotations


def plp_oracle(
    n: int,
    edges: list[tuple[int, int, float]],
    max_iterations: int = 100,
) -> dict[int, int]:
    adj: dict[int, list[tuple[int, float]]] = {i: [] for i in range(n)}
    for e in edges:
        u, v = int(e[0]), int(e[1])
        w = float(e[2]) if len(e) > 2 else 1.0
        if u == v:
            adj[u].append((u, w))  # self-loop: one incident arc
        else:
            adj[u].append((v, w))
            adj[v].append((u, w))
    labels = {i: i for i in range(n)}
    for _ in range(max_iterations):
        new = dict(labels)
        changed = 0
        for v in range(n):
            if not adj[v]:
                continue
            weights: dict[int, float] = {}
            for u, w in adj[v]:
                lw = labels[u]
                weights[lw] = weights.get(lw, 0.0) + w
            best_w = max(weights.values())
            heaviest = min(l for l, w in weights.items() if w == best_w)
            if heaviest != labels[v]:
                new[v] = heaviest
                changed += 1
        labels = new
        if changed == 0:
            break
    return labels
