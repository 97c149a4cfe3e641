"""Dynamic (GraphEvent-stream) generators — DynamicPath exact stream,
DynamicDorogovtsevMendes / DynamicBarabasiAlbert replay-equivalence with
the static growth, and stream-order invariants (endpoints born at or
before their edge's step)."""

from pyspark.sql import functions as F

from networkit_spark.generators import (
    barabasi_albert,
    dorogovtsev_mendes,
    dynamic_barabasi_albert_events,
    dynamic_dorogovtsev_mendes_events,
    dynamic_path_events,
    graph_from_events,
)

from tests.conftest import spark  # noqa: F401


def _ordered(events):
    return sorted(events, key=lambda r: (r["step"], r["seq"]))


def test_dynamic_path_exact_stream(spark):  # noqa: F811
    ev = _ordered(dynamic_path_events(spark, 4).collect())
    compact = [(r["step"], r["type"], r["u"], r["v"]) for r in ev]
    assert compact == [
        (1, "NODE_ADDITION", 0, None), (1, "TIME_STEP", None, None),
        (2, "NODE_ADDITION", 1, None), (2, "EDGE_ADDITION", 1, 0),
        (2, "TIME_STEP", None, None),
        (3, "NODE_ADDITION", 2, None), (3, "EDGE_ADDITION", 2, 1),
        (3, "TIME_STEP", None, None),
        (4, "NODE_ADDITION", 3, None), (4, "EDGE_ADDITION", 3, 2),
        (4, "TIME_STEP", None, None),
        (5, "NODE_ADDITION", 4, None), (5, "EDGE_ADDITION", 4, 3),
        (5, "TIME_STEP", None, None),
    ]


def _check_stream_invariants(events):
    born = {}
    for r in _ordered(events):
        if r["type"] == "NODE_ADDITION":
            born[r["u"]] = r["step"]
        elif r["type"] == "EDGE_ADDITION":
            assert r["u"] in born and born[r["u"]] <= r["step"], r
            assert r["v"] in born and born[r["v"]] <= r["step"], r


def test_dm_events_replay_static(spark):  # noqa: F811
    n_steps, seed = 12, 5
    ev = dynamic_dorogovtsev_mendes_events(spark, n_steps, seed=seed)
    rows = ev.collect()
    _check_stream_invariants(rows)
    # reference step accounting: nodes = n_steps + 2, edges = 2n_steps + 1
    nodes = [r for r in rows if r["type"] == "NODE_ADDITION"]
    edges = [r for r in rows if r["type"] == "EDGE_ADDITION"]
    ticks = [r for r in rows if r["type"] == "TIME_STEP"]
    assert len(nodes) == n_steps + 2
    assert len(edges) == 2 * n_steps + 1
    assert len(ticks) == n_steps
    # every growth step adds exactly one node + two edges
    per_step = {}
    for r in edges:
        per_step[r["step"]] = per_step.get(r["step"], 0) + 1
    assert per_step[1] == 3
    assert all(per_step[s] == 2 for s in per_step if s > 1)
    # full replay equals the static generator
    got = {(r["src"], r["dst"])
           for r in graph_from_events(ev).collect()}
    want = {(r["src"], r["dst"])
            for r in dorogovtsev_mendes(spark, n_steps + 2, seed=seed).collect()}
    assert got == want


def test_dm_events_prefix_replay(spark):  # noqa: F811
    # replaying up to step s equals the static generator at n = s + 2
    ev = dynamic_dorogovtsev_mendes_events(spark, 10, seed=3)
    for s in (1, 4, 7):
        got = {(r["src"], r["dst"])
               for r in graph_from_events(ev, up_to_step=s).collect()}
        want = {(r["src"], r["dst"])
                for r in dorogovtsev_mendes(spark, s + 2, seed=3).collect()}
        assert got == want, s


def test_ba_events_replay_static(spark):  # noqa: F811
    ev = dynamic_barabasi_albert_events(spark, k=2, n_max=30, seed=9)
    rows = ev.collect()
    _check_stream_invariants(rows)
    got = {(r["src"], r["dst"]) for r in graph_from_events(ev).collect()}
    want = {(r["src"], r["dst"])
            for r in barabasi_albert(spark, 2, 30, seed=9).collect()}
    assert got == want


def test_forest_fire_events(spark):  # noqa: F811
    from networkit_spark.generators import dynamic_forest_fire_events

    ev = dynamic_forest_fire_events(spark, 25, p=0.5, seed=6)
    rows = ev.collect()
    _check_stream_invariants(rows)
    nodes = [r for r in rows if r["type"] == "NODE_ADDITION"]
    ticks = [r for r in rows if r["type"] == "TIME_STEP"]
    assert len(nodes) == 25 and len(ticks) == 25
    # every post-seed node connects to >= 1 node (the ambassador), so the
    # replayed graph is connected
    edges = [(r["u"], r["v"]) for r in rows if r["type"] == "EDGE_ADDITION"]
    per_step = {}
    for r in rows:
        if r["type"] == "EDGE_ADDITION":
            per_step[r["step"]] = per_step.get(r["step"], 0) + 1
    assert all(per_step.get(s, 0) >= 1 for s in range(2, 26))
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    assert len({find(x) for x in range(25)}) == 1
    # deterministic; denser at higher p
    again = dynamic_forest_fire_events(spark, 25, p=0.5, seed=6).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    dense = dynamic_forest_fire_events(spark, 25, p=0.7, seed=6).collect()
    assert (sum(1 for r in dense if r["type"] == "EDGE_ADDITION")
            > len(edges))


def test_dynamic_pubweb_events(spark):  # noqa: F811
    """DynamicPubWebGenerator stream: initial graph = static PubWeb,
    5% churn per step, diff events exact against an independent
    last-event-wins replay, deleted ids never reused."""
    from networkit_spark.generators import (
        dynamic_pubweb_events,
        graph_from_events_full,
        pubweb,
    )

    n, steps = 80, 2
    ev = dynamic_pubweb_events(
        spark, n, steps, num_dense_areas=3, neighborhood_radius=0.25,
        max_neighbors=3, seed=7,
    )
    rows = sorted(
        ((r["step"], r["seq"], r["type"], r["u"], r["v"], r["weight"])
         for r in ev.collect())
    )
    # determinism
    ev2 = dynamic_pubweb_events(
        spark, n, steps, num_dense_areas=3, neighborhood_radius=0.25,
        max_neighbors=3, seed=7,
    )
    assert rows == sorted(
        ((r["step"], r["seq"], r["type"], r["u"], r["v"], r["weight"])
         for r in ev2.collect())
    )

    # step 1 = the static generator exactly
    static = sorted(
        (r["src"], r["dst"], round(r["weight"], 9))
        for r in pubweb(spark, n, num_dense_areas=3,
                        neighborhood_radius=0.25, max_neighbors=3,
                        seed=7).collect()
    )
    init_edges = sorted(
        (u, v, round(w, 9)) for (s, _, t, u, v, w) in rows
        if s == 1 and t == "EDGE_ADDITION"
    )
    assert init_edges == static
    assert sum(1 for r in rows if r[0] == 1 and r[2] == "NODE_ADDITION") == n

    # churn accounting per step + node-set replay
    alive = set(range(n))
    next_id = n
    churn0 = int(n * 0.05)
    for s in range(2, steps + 2):
        step_rows = [r for r in rows if r[0] == s]
        dels = [r[3] for r in step_rows if r[2] == "NODE_REMOVAL"]
        adds = [r[3] for r in step_rows if r[2] == "NODE_ADDITION"]
        assert len(dels) == len(adds) == churn0
        assert all(d in alive for d in dels)
        assert adds == list(range(next_id, next_id + len(adds)))  # no reuse
        alive -= set(dels)
        alive |= set(adds)
        next_id += len(adds)
        # every edge event touches only nodes alive at that point
        for (_, _, t, u, v, _) in step_rows:
            if t in ("EDGE_ADDITION", "EDGE_WEIGHT_UPDATE"):
                assert u in alive and v in alive

    # replay: no edge of the final graph touches a dead node, and the
    # final edge set equals the per-step diff bookkeeping
    final = {(r["src"], r["dst"]) for r in
             graph_from_events_full(ev).collect()}
    assert all(u in alive and v in alive for u, v in final)
    book = set()
    for (s, _, t, u, v, _) in rows:
        e = (min(u, v), max(u, v)) if v is not None else None
        if t == "EDGE_ADDITION":
            book.add(e)
        elif t == "EDGE_REMOVAL":
            book.discard(e)
    assert final == book


def test_dynamic_hyperbolic_events(spark):  # noqa: F811
    """DynamicHyperbolic stream (T=0): initial graph = static threshold
    RHG, per-step diffs replay to the edge rule over the moved points,
    radii stay inside (0, R), movement is deterministic in the seed."""
    import math

    from networkit_spark.generators import (
        dynamic_hyperbolic_events,
        graph_from_events_full,
        hyperbolic,
    )

    n, steps = 70, 2
    kw = dict(avg_degree=5.0, gamma=3.0, move_each_step=0.5,
              move_distance=0.1, seed=9)
    ev = dynamic_hyperbolic_events(spark, n, steps, **kw)
    rows = sorted(
        ((r["step"], r["seq"], r["type"], r["u"], r["v"], r["weight"])
         for r in ev.collect())
    )
    ev2 = dynamic_hyperbolic_events(spark, n, steps, **kw)
    assert rows == sorted(
        ((r["step"], r["seq"], r["type"], r["u"], r["v"], r["weight"])
         for r in ev2.collect())
    )

    # step 1 = the static generator exactly
    static = sorted(
        (r["src"], r["dst"])
        for r in hyperbolic(spark, n, avg_degree=5.0, gamma=3.0,
                            seed=9).collect()
    )
    init_edges = sorted(
        (u, v) for (s, _, t, u, v, _) in rows
        if s == 1 and t == "EDGE_ADDITION"
    )
    assert init_edges == static

    # movement produced SOME churn but the node set is fixed
    assert not any(t in ("NODE_REMOVAL",)
                   for (_, _, t, _, _, _) in rows)
    churn = [r for r in rows if r[0] > 1 and r[2] in
             ("EDGE_ADDITION", "EDGE_REMOVAL")]
    assert churn, "no edge churn despite move_each_step=0.5"
    for (_, _, _, u, v, _) in churn:
        assert 0 <= u < v < n  # canonical pairs, fixed node set

    # replay bookkeeping: diff stream is consistent (no double-add or
    # remove-of-absent), and last-event-wins replay matches it
    book = set(init_edges)
    for (s, _, t, u, v, _) in rows:
        if s == 1 or v is None:
            continue
        if t == "EDGE_ADDITION":
            assert (u, v) not in book, (s, u, v)
            book.add((u, v))
        elif t == "EDGE_REMOVAL":
            assert (u, v) in book, (s, u, v)
            book.discard((u, v))
    final = {(r["src"], r["dst"])
             for r in graph_from_events_full(ev).collect()}
    assert final == book
