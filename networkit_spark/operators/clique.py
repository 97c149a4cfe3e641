"""MaximalCliques (reference: cpp/clique/MaximalCliques.cpp — the
Eppstein–Löffler–Strash degeneracy-ordered Bron–Kerbosch with pivoting).

The SET of maximal cliques of a graph is unique, so although the
reference enumerates them in core-ordering-dependent order, the sorted
clique set is an exact, order-free contract (pytest holds this engine to
a brute-force enumerator; the driver query holds soundness properties +
count in SQL).

Spark shape (the reference's decomposition, distributed):
- vertices get the degeneracy-style total order key (core number, id) —
  the reference orders by CoreDecomposition node order
  (MaximalCliques.cpp:82-94) precisely so each per-vertex subproblem is
  bounded by the degeneracy d, not the max degree;
- for every vertex u, one independent subproblem enumerates exactly the
  maximal cliques whose EARLIEST member (in that order) is u: P = later
  neighbors of u, X = earlier neighbors of u (the X set makes local
  maximality equal global maximality — standard ELS);
- each subproblem needs u's 1-hop subgraph: the wedge join
  (u, a, b) for every adjacent pair a, b ∈ N(u) — the triangle plan's
  fan-out, Θ(Σ_u |E(N(u))|);
- subproblems run in parallel via applyInPandas (one Arrow group per
  u, pivoting Bron–Kerbosch in numpy/sets inside); work per group is
  O(3^(d/3)) — bounded by the degeneracy, the web-graph-friendly bound.

Output explodes cliques to rows (clique: array<long>, sorted ascending)
— globally deduplicated by construction (each clique is emitted only at
its earliest member).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType
from pyspark.storagelevel import StorageLevel

from networkit_spark.graph import Graph

_SCHEMA = StructType([StructField("clique", ArrayType(LongType()), False)])


def _bron_kerbosch_pivot(adj: dict, r: list, p: set, x: set, out: list):
    if not p and not x:
        out.append(sorted(r))
        return
    # pivot: vertex of P ∪ X with most neighbors in P (ties → smallest id)
    pivot = max(
        sorted(p | x), key=lambda v: len(adj.get(v, frozenset()) & p)
    )
    for v in sorted(p - adj.get(pivot, frozenset())):
        nv = adj.get(v, frozenset())
        _bron_kerbosch_pivot(adj, r + [v], p & nv, x & nv, out)
        p = p - {v}
        x = x | {v}


def maximal_cliques(g: Graph) -> DataFrame:
    """(clique: array<long> ascending) — all maximal cliques (size ≥ 1;
    isolated vertices are their own maximal cliques, matching the
    reference's BK semantics on empty P/X)."""
    if g.directed:
        raise ValueError("maximal_cliques expects an undirected graph")
    from networkit_spark.operators.centrality import core_decomposition

    sym = (
        g.symmetrized_edges()
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cores = core_decomposition(g).select(
        "id", F.col("core").cast("long").alias("core")
    )
    # total order key: (core, id) — lexicographic struct comparison keeps
    # the per-subproblem P set degeneracy-bounded like the reference's
    # core ordering (any total order preserves the unique clique set)
    rk = cores.select(F.col("id"), F.struct("core", "id").alias("key"))
    e = (
        sym.join(rk.select(F.col("id").alias("src"), F.col("key").alias("ku")), "src")
        .join(rk.select(F.col("id").alias("dst"), F.col("key").alias("kv")), "dst")
    )
    # arcs of u's subproblem graph: adjacency among N(u) (wedge fan-out)
    nbr = e.select("src", "dst", (F.col("ku") < F.col("kv")).alias("later"))
    wedges = (
        nbr.alias("w1")
        .join(nbr.alias("w2"), F.col("w1.src") == F.col("w2.src"))
        .filter(F.col("w1.dst") < F.col("w2.dst"))
        .join(
            sym.select(
                F.col("src").alias("a"), F.col("dst").alias("b"),
                F.lit(True).alias("adj"),
            ),
            (F.col("w1.dst") == F.col("a")) & (F.col("w2.dst") == F.col("b")),
            "left",
        )
        .filter(F.col("adj"))
        .select(
            F.col("w1.src").alias("u"),
            F.col("w1.dst").alias("a"),
            F.col("w2.dst").alias("b"),
        )
    )
    # per-u group payload: neighbor roster with later/earlier flag + the
    # adjacency among them; marker rows (b = null) carry the roster
    roster = nbr.select(
        F.col("src").alias("u"), F.col("dst").alias("a"),
        F.lit(None).cast("long").alias("b"), F.col("later"),
    )
    adj_rows = wedges.select("u", "a", "b", F.lit(None).cast("boolean").alias("later"))
    payload = roster.unionByName(adj_rows)

    def enumerate_group(pdf):
        import pandas as pd

        u = int(pdf["u"].iloc[0])
        roster_rows = pdf[pdf["b"].isna()]
        later = set(roster_rows.loc[roster_rows["later"] == True, "a"].astype(int))
        earlier = set(roster_rows.loc[roster_rows["later"] == False, "a"].astype(int))
        adj = {}
        sub = pdf[pdf["b"].notna()]
        for a, b in zip(sub["a"].astype(int), sub["b"].astype(int)):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        adj = {k: frozenset(v) for k, v in adj.items()}
        out = []
        _bron_kerbosch_pivot(adj, [u], later, earlier, out)
        return pd.DataFrame({"clique": out}) if out else pd.DataFrame(
            {"clique": pd.Series([], dtype=object)}
        )

    cliques = payload.groupBy("u").applyInPandas(enumerate_group, _SCHEMA)
    # isolated vertices never appear in payload: add their singleton cliques
    isolated = g.vertices().join(
        sym.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).select(F.array(F.col("id")).alias("clique"))
    return cliques.unionByName(isolated)
