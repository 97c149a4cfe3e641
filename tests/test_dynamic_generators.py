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
