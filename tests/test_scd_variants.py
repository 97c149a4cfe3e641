"""SCD variants (TCE / LTE / LocalT / TwoPhaseL / CliqueDetect /
CombinedSCD / RandomBFS) vs incremental pure-Python replicas
transcribed from the reference's bookkeeping (TCE.cpp /
LocalTightnessExpansion.cpp / LocalT.cpp / TwoPhaseL.cpp), plus
planted-structure recovery and brute-force clique checks."""

import math
import random
from collections import defaultdict

from networkit_spark.graph import Graph
from networkit_spark.operators.scd_variants import (
    clique_detect_expand,
    combined_expand,
    local_t_expand,
    lte_expand,
    random_bfs_expand,
    scd_run,
    tce_expand,
    two_phase_l_expand,
)
from tests.conftest import spark  # noqa: F401


def _ieee_div(a, b):
    if b != 0:
        return a / b
    if a == 0:
        return float("nan")
    return math.inf if a > 0 else -math.inf


def _rand_graph(n, p, seed, weighted=False):
    rng = random.Random(seed)
    wadj = defaultdict(dict)
    pairs = []
    for u in range(n):
        for v in range(u + 1, n):
            if rng.random() < p:
                w = (rng.randrange(1, 9) / 2.0) if weighted else 1.0
                wadj[u][v] = w
                wadj[v][u] = w
                pairs.append((u, v, w))
    for u in range(n):
        wadj.setdefault(u, {})
    return dict(wadj), pairs


def _graph_of(spark, pairs, n, weighted=False):
    return Graph.from_pairs(
        spark,
        pairs if weighted else [(u, v) for u, v, _ in pairs],
        directed=False,
        n=n,
        weighted=weighted,
    )


# ------------------------------------------------------------ TCE replica
def _py_tce(wadj, seeds, refine=False, jaccard=False, weighted=False):
    result = set(seeds)
    wd = {u: sum(wadj[u].values()) for u in wadj}
    deg = {u: len(wadj[u]) for u in wadj}
    node_score = defaultdict(float)
    cut_edges = defaultdict(float)
    heap = set()

    def update_shell(u):
        nb = wadj[u]
        if not nb:
            return 0.0
        x_deg = wd[u]
        tri = defaultdict(float)
        vs = sorted(nb)
        for i, v in enumerate(vs):
            for y in vs[i + 1:]:
                w_vy = wadj[v].get(y)
                if w_vy is not None:
                    tri[y] += min(nb[v], w_vy) if weighted else 1.0
                    tri[v] += min(nb[y], w_vy) if weighted else 1.0
        for v, w_uv in nb.items():
            if v in result:
                continue
            nom = w_uv + tri[v]
            if wd[v] > 0:
                denom = (wd[v] + x_deg - nom) if jaccard else min(wd[v], x_deg)
                node_score[v] += nom / (denom * deg[v])
            heap.add(v)
            cut_edges[v] += w_uv
        return x_deg

    volume = 0.0
    for u in sorted(result):
        volume += update_shell(u)
    num_cut = sum(cut_edges[v] for v in cut_edges if v not in result)

    while heap:
        u = max(heap, key=lambda v: (node_score[v], -v))
        heap.discard(u)
        u_vol = wd[u]
        cut_new = num_cut + u_vol - 2.0 * cut_edges[u]
        vol_new = volume + u_vol
        if _ieee_div(cut_new, vol_new) < _ieee_div(num_cut, volume):
            result.add(u)
            update_shell(u)
            num_cut, volume = cut_new, vol_new

    if refine:
        for u in sorted(result):
            u_vol = wd[u]
            change = sum(
                (w if v in result else -w) for v, w in wadj[u].items()
            )
            cut_new = num_cut + change
            vol_new = volume - u_vol
            if _ieee_div(cut_new, vol_new) < _ieee_div(num_cut, volume):
                result.remove(u)
                num_cut, volume = cut_new, vol_new
    return result


# ------------------------------------------------------------ LTE replica
def _py_lte(wadj, seeds, alpha=1.0):
    wd = {
        u: math.sqrt(1.0 + sum(w * w for w in wadj[u].values())) for u in wadj
    }
    result, in_shell, heap = set(), set(), set()
    nis, nes = defaultdict(float), defaultdict(float)
    state = {"int": 0.0, "ext": 0.0}

    def tri_of(u):
        nb = wadj[u]
        tri = {v: 2.0 * w for v, w in nb.items()}
        vs = sorted(nb)
        for i, v in enumerate(vs):
            for y in vs[i + 1:]:
                w_vy = wadj[v].get(y)
                if w_vy is not None:
                    tri[y] += nb[v] * w_vy
                    tri[v] += nb[y] * w_vy
        return tri

    def update_shell(u):
        tri = tri_of(u)
        new_shell = []
        for v in sorted(wadj[u]):
            score = tri[v] / (wd[v] * wd[u])
            nis[v] += score
            if v in result:
                state["ext"] -= score
                state["int"] += 2.0 * score
                if u not in in_shell:
                    nis[u] += score
                nes[v] -= score
            else:
                state["ext"] += score
                if u not in in_shell:
                    nes[u] += score
                heap.add(v)
                if v not in in_shell:
                    in_shell.add(v)
                    new_shell.append(v)
                else:
                    nes[v] -= score
        for s in new_shell:
            tri_s = tri_of(s)
            for x in sorted(wadj[s]):
                if x not in result:
                    nes[s] += tri_s[x] / (wd[x] * wd[s])

    for u in sorted(seeds):
        heap.discard(u)
        result.add(u)
        update_shell(u)

    while heap:
        u = max(heap, key=lambda v: (nis[v], -v))
        heap.discard(u)
        if (
            _ieee_div(state["ext"], state["int"])
            - _ieee_div(alpha * nes[u] - nis[u], 2.0 * nis[u])
            > 0
        ):
            result.add(u)
            update_shell(u)
    return result


# --------------------------------------------------------- LocalT replica
def _py_local_t(wadj, seeds):
    result, shell, in_shell = set(), set(), set()
    nit, net, nst = defaultdict(int), defaultdict(int), defaultdict(int)
    state = {"int": 0, "ext": 0}

    def update_shell(u):
        vs = sorted(wadj[u])
        for i, v in enumerate(vs):
            for w in vs[i + 1:]:
                if w in wadj[v]:
                    rv, rw = v in result, w in result
                    if rv and rw:
                        nit[v] += 1
                        nit[w] += 1
                        state["int"] += 1
                    elif rv or rw:
                        state["ext"] -= 1
                        t = w if rv else v
                        nit[t] += 1
                        nst[t] -= 1
                    else:
                        state["ext"] += 1
                        for t in (v, w):
                            if t in in_shell:
                                net[t] -= 1
                            nst[t] += 1
        for v in sorted(wadj[u]):
            if v not in in_shell and v not in result:
                shell.add(v)
                in_shell.add(v)
                xs = sorted(wadj[v])
                for i, x in enumerate(xs):
                    for y in xs[i + 1:]:
                        if (
                            y in wadj[x]
                            and x not in result
                            and y not in result
                        ):
                            net[v] += 1

    for u in sorted(seeds):
        result.add(u)
        shell.discard(u)
        update_shell(u)

    while True:
        best, best_ext = None, None
        best_score = max(0, state["int"] * (state["int"] - state["ext"]))
        for v in sorted(shell):
            ni = state["int"] + nit[v]
            ne = state["ext"] + net[v] - nst[v]
            ns = max(0, ni * (ni - ne))
            if ns > best_score or (
                ns == best_score and (best_ext is None or ne < best_ext)
            ):
                best, best_score, best_ext = v, ns, ne
        if best is None:
            return result
        result.add(best)
        shell.discard(best)
        update_shell(best)


# ------------------------------------------------------ TwoPhaseL replica
def _py_two_phase_l(wadj, seeds):
    members = set(seeds)

    def q():
        int2 = cut = 0.0
        b = 0
        for u in members:
            ext = False
            for v, w in wadj[u].items():
                if v in members:
                    int2 += w
                else:
                    cut += w
                    ext = True
            b += 1 if ext else 0
        return int2 / 2.0, cut, b

    while True:
        int_w, cut, b = q()
        cur_lin = _ieee_div(2.0 * int_w, len(members))
        cur_lex = _ieee_div(cut, b)
        l_max = _ieee_div(cur_lin, cur_lex)
        shell = sorted(
            {v for u in members for v in wadj[u] if v not in members}
        )
        best = None
        for v in shell:
            int_v = sum(w for u, w in wadj[v].items() if u in members)
            ext_v = sum(wadj[v].values()) - int_v
            excl = sum(
                1
                for u in wadj[v]
                if u in members
                and all(x in members for x in wadj[u] if x != v)
            )
            n_lin = _ieee_div(2.0 * (int_w + int_v), len(members) + 1)
            n_lex = _ieee_div(
                cut - int_v + ext_v, b - excl + (1 if ext_v > 0 else 0)
            )
            n_l = _ieee_div(n_lin, n_lex)
            if n_lin > cur_lin and (
                n_l > l_max or (n_l == l_max and best is None)
            ):
                best, l_max = v, n_l
        if best is None:
            break
        members.add(best)

    for v in sorted(members):
        int_w, cut, b = q()
        cur_lin = _ieee_div(2.0 * int_w, len(members))
        cur_lex = _ieee_div(cut, b)
        int_v = sum(w for u, w in wadj[v].items() if u in members)
        ext_v = sum(wadj[v].values()) - int_v
        fully = sum(
            1
            for u in wadj[v]
            if u in members and all(x in members for x in wadj[u])
        )
        bch = fully - (1 if ext_v > 0 else 0)
        n_lin = _ieee_div(2.0 * (int_w - int_v), len(members) - 1)
        n_lex = _ieee_div(cut + int_v - ext_v, b + bch)
        if not (cur_lin > n_lin and cur_lex < n_lex):
            members.remove(v)
            if not members:
                break
    if any(s not in members for s in seeds):
        return set()
    return members


# ------------------------------------------------------------------ tests
def test_tce_matches_replica(spark):  # noqa: F811
    wadj, pairs = _rand_graph(18, 0.22, seed=5)
    g = _graph_of(spark, pairs, 18)
    for seed_node in (0, 7):
        want = _py_tce(wadj, [seed_node])
        assert tce_expand(g, [seed_node]) == want


def test_tce_jaccard_refine_matches_replica(spark):  # noqa: F811
    wadj, pairs = _rand_graph(16, 0.25, seed=11)
    g = _graph_of(spark, pairs, 16)
    want = _py_tce(wadj, [3], refine=True, jaccard=True)
    assert tce_expand(g, [3], refine=True, use_jaccard=True) == want


def test_tce_weighted_matches_replica(spark):  # noqa: F811
    wadj, pairs = _rand_graph(14, 0.3, seed=2, weighted=True)
    g = _graph_of(spark, pairs, 14, weighted=True)
    want = _py_tce(wadj, [1], weighted=True)
    assert tce_expand(g, [1]) == want


def test_lte_matches_replica(spark):  # noqa: F811
    wadj, pairs = _rand_graph(16, 0.25, seed=9)
    g = _graph_of(spark, pairs, 16)
    for alpha in (1.0, 2.0):
        want = _py_lte(wadj, [4], alpha=alpha)
        assert lte_expand(g, [4], alpha=alpha) == want


def test_lte_weighted_matches_replica(spark):  # noqa: F811
    wadj, pairs = _rand_graph(13, 0.3, seed=13, weighted=True)
    g = _graph_of(spark, pairs, 13, weighted=True)
    want = _py_lte(wadj, [0])
    assert lte_expand(g, [0]) == want


def test_local_t_matches_replica(spark):  # noqa: F811
    wadj, pairs = _rand_graph(18, 0.25, seed=21)
    g = _graph_of(spark, pairs, 18)
    for seed_node in (0, 5):
        want = _py_local_t(wadj, [seed_node])
        assert local_t_expand(g, [seed_node]) == want


def test_two_phase_l_matches_replica(spark):  # noqa: F811
    wadj, pairs = _rand_graph(16, 0.25, seed=17)
    g = _graph_of(spark, pairs, 16)
    for seed_node in (2, 9):
        want = _py_two_phase_l(wadj, [seed_node])
        assert two_phase_l_expand(g, [seed_node]) == want


def _two_cliques(spark):
    # two 6-cliques joined by one bridge edge (5, 10)
    edges = [(i, j, 1.0) for i in range(6) for j in range(i + 1, 6)]
    edges += [(10 + i, 10 + j, 1.0) for i in range(6) for j in range(i + 1, 6)]
    edges.append((5, 10, 1.0))
    return _graph_of(spark, edges, 16)


def test_planted_clique_recovery(spark):  # noqa: F811
    g = _two_cliques(spark)
    want = set(range(6))
    assert tce_expand(g, [0]) == want
    assert lte_expand(g, [0]) == want
    assert local_t_expand(g, [0]) == want
    # TwoPhaseL's remove phase drops the bridge endpoint 5: keeping a
    # member requires removal to STRICTLY worsen both Lin and Lex, and
    # removing 5 leaves Lex unchanged (cut 1→5, boundary 1→5).
    assert two_phase_l_expand(g, [0]) == {0, 1, 2, 3, 4}


def test_clique_detect_matches_bruteforce(spark):  # noqa: F811
    wadj, pairs = _rand_graph(14, 0.4, seed=3)
    g = _graph_of(spark, pairs, 14)
    for seed_node in (0, 6):
        cands = sorted(wadj[seed_node])
        best = []
        # brute force over all candidate subsets
        for mask in range(1, 1 << len(cands)):
            sub = [cands[i] for i in range(len(cands)) if mask >> i & 1]
            if all(
                b in wadj[a] for i, a in enumerate(sub) for b in sub[i + 1:]
            ):
                if len(sub) > len(best) or (
                    len(sub) == len(best) and sub < best
                ):
                    best = sub
        got = clique_detect_expand(g, [seed_node])
        assert got == {seed_node} | set(best), (seed_node, got, best)


def test_clique_detect_weighted_multiseed(spark):  # noqa: F811
    # seeds {0,1}: common neighbors are 2,3,4; {2,3} edge weight 5
    # beats the singleton 4 even though 4's seed edges are heavy
    pairs = [
        (0, 1, 1.0),
        (0, 2, 1.0), (1, 2, 1.0),
        (0, 3, 1.0), (1, 3, 1.0),
        (0, 4, 3.0), (1, 4, 3.0),
        (2, 3, 5.0),
    ]
    g = _graph_of(spark, pairs, 5, weighted=True)
    assert clique_detect_expand(g, [0, 1]) == {0, 1, 2, 3}


def test_combined_clique_then_tce(spark):  # noqa: F811
    g = _two_cliques(spark)
    got = combined_expand(
        g, [0], clique_detect_expand, lambda gr, s: tce_expand(gr, s)
    )
    assert got == tce_expand(g, clique_detect_expand(g, [0]))
    assert got == set(range(6))


def test_random_bfs_cover_size_and_levels(spark):  # noqa: F811
    # path 0-1-2-3-4-5 with seed 0 in a cover community of size 3:
    # level {0} + level {1} fit, level {2} tops it off
    pairs = [(i, i + 1, 1.0) for i in range(5)]
    g = _graph_of(spark, pairs, 6)
    cover = {0: {7}, 1: {7}, 4: {7}, 5: {8}}
    got = random_bfs_expand(g, [0], cover)
    assert got == {0, 1, 2}
    # no common community → size = number of seeds
    got2 = random_bfs_expand(g, [0, 5], {0: {7}, 5: {8}})
    assert got2 == {0, 5}


def test_scd_run_per_seed(spark):  # noqa: F811
    g = _two_cliques(spark)
    out = scd_run(g, [0, 12], tce_expand)
    assert out[0] == set(range(6))
    assert out[12] == {10, 11, 12, 13, 14, 15}
