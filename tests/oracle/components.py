"""BFS connected-components oracle (reference: sequential BFS,
networkit/cpp/components/ConnectedComponentsImpl.cpp:23-68), canonicalized
to label = min node id per component."""

from __future__ import annotations

from collections import deque


def components_oracle(n: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Undirected reachability → {node: min-id-in-component}."""
    adj: dict[int, list[int]] = {i: [] for i in range(n)}
    for e in edges:
        u, v = int(e[0]), int(e[1])
        adj[u].append(v)
        adj[v].append(u)
    label = {}
    for start in range(n):
        if start in label:
            continue
        comp = [start]
        seen = {start}
        q = deque([start])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    comp.append(v)
                    q.append(v)
        m = min(comp)
        for u in comp:
            label[u] = m
    return label
