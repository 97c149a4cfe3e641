"""GCE — pure-Python greedy replica (same min-id tie-break) for both
objectives, planted-clique recovery, and whole-component absorption
(the +inf/0 quality edge case)."""

from networkit_spark.graph import Graph
from networkit_spark.operators.gce import gce_expand
from tests.conftest import spark  # noqa: F401
from tests.test_commutetime import _connected_er
from tests.test_groupcentrality import _adj


def _py_gce(und, seeds, objective):
    adj = _adj(und)
    C = set(seeds)

    def int_deg(v):
        return sum(1 for w in adj.get(v, ()) if w in C)

    def stats():
        intw = sum(1 for u, v in und if u in C and v in C)
        cut = sum(1 for u, v in und if (u in C) != (v in C))
        return intw, cut

    while True:
        intw, cut = stats()
        shell = sorted(
            {w for u in C for w in adj.get(u, ()) if w not in C}
        )
        if objective == "M":
            q = intw / cut if cut else 0.0
        else:
            bset = {u for u in C if any(w not in C for w in adj.get(u, ()))}
            q = (2.0 * intw * len(bset)) / (len(C) * cut) if cut else 0.0
        best, bdq = None, 0.0
        for v in shell:
            i = int_deg(v)
            e = len(adj.get(v, ())) - i
            den = cut - i + e
            if objective == "M":
                dq = ((intw + i) / den if den > 0 else float("inf")) - q
            else:
                closed = sum(
                    1 for u in adj.get(v, ())
                    if u in C
                    and sum(1 for w in adj.get(u, ()) if w not in C) == 1
                )
                bch = -closed + (1 if e > 0 else 0)
                if den <= 0:
                    continue
                dq = (2.0 * (intw + i) * (len(bset) + bch)) \
                    / ((len(C) + 1) * den) - q
            if dq > bdq:
                best, bdq = v, dq
        if best is None:
            return C
        C.add(best)


def test_gce_m_matches_replica(spark):  # noqa: F811
    g, und = _connected_er(spark, 16, 0.25, seed=4)
    want = _py_gce(und, [0], "M")
    got = gce_expand(g, [0], objective="M")
    assert got == want


def test_gce_l_matches_replica(spark):  # noqa: F811
    g, und = _connected_er(spark, 14, 0.25, seed=8)
    want = _py_gce(und, [2], "L")
    got = gce_expand(g, [2], objective="L")
    assert got == want


def test_gce_recovers_planted_clique(spark):  # noqa: F811
    # two 6-cliques joined by ONE bridge edge: expanding from the first
    # absorbs exactly that clique (the bridge node's ΔM is negative —
    # intDeg 1 against extDeg 5)
    edges = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    edges += [(10 + i, 10 + j) for i in range(6) for j in range(i + 1, 6)]
    edges.append((5, 10))
    g = Graph.from_pairs(spark, edges, directed=False)
    got = gce_expand(g, [0], objective="M")
    assert got == set(range(6))


def test_gce_absorbs_isolated_component(spark):  # noqa: F811
    # disjoint 4-clique + triangle: expansion from the clique must take
    # the WHOLE clique (final pick divides by zero → +inf in the ref)
    edges = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    edges += [(10, 11), (11, 12), (10, 12)]
    g = Graph.from_pairs(spark, edges, directed=False)
    got = gce_expand(g, [0], objective="M")
    assert got == {0, 1, 2, 3}


def test_gce_bad_objective_raises(spark):  # noqa: F811
    g = Graph.from_pairs(spark, [(0, 1)], directed=False)
    try:
        gce_expand(g, [0], objective="X")
        assert False
    except ValueError as e:
        assert "objective" in str(e)
