"""Profile the lfr_plm bench entry: per-sweep and per-level wall times.

Usage: python scripts/profile_plm.py [max_iter]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from networkit_spark.generators import lfr
from networkit_spark.graph import Graph
from networkit_spark.operators.quality import nmi
from networkit_spark.session import get_spark


def main():
    max_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark(
        "profile-plm", cores=32, shuffle_partitions=32,
        extra_conf={"spark.local.dir": "/dev/shm/spark"},
    )
    lfr_edges, lfr_truth = lfr(spark, 20000, mu=0.1, seed=42)
    lfr_edges = lfr_edges.persist()
    m = lfr_edges.count()
    g = Graph.from_edges(lfr_edges, directed=False)
    print(f"LFR edges: {m}", file=sys.stderr)

    from networkit_spark.operators import plm as plm_mod

    # monkey-patch timing into the move phase
    orig_move = plm_mod._move_phase

    def timed_move(graph, labels, total, gamma, max_iter, **kw):
        t0 = time.perf_counter()
        out = orig_move(graph, labels, total, gamma, max_iter, **kw)
        dt = time.perf_counter() - t0
        n = graph.edges.count()
        print(f"  move_phase: {dt:.2f}s arcs={n} moves={out[2]}", file=sys.stderr)
        return out

    plm_mod._move_phase = timed_move

    from networkit_spark.operators import coarsening as coars_mod

    orig_coarsen = coars_mod.coarsen
    orig_prolong = coars_mod.prolong

    def timed_coarsen(*a, **kw):
        t0 = time.perf_counter()
        out = orig_coarsen(*a, **kw)
        print(f"  coarsen(lazy): {time.perf_counter()-t0:.2f}s", file=sys.stderr)
        return out

    def timed_prolong(*a, **kw):
        t0 = time.perf_counter()
        out = orig_prolong(*a, **kw)
        print(f"  prolong(lazy): {time.perf_counter()-t0:.2f}s", file=sys.stderr)
        return out

    coars_mod.coarsen = timed_coarsen
    coars_mod.prolong = timed_prolong
    plm_mod.coarsen = timed_coarsen
    plm_mod.prolong = timed_prolong

    orig_local = plm_mod._local_louvain

    def timed_local(*a, **kw):
        t0 = time.perf_counter()
        out = orig_local(*a, **kw)
        print(f"  local_louvain: {time.perf_counter()-t0:.2f}s", file=sys.stderr)
        return out

    plm_mod._local_louvain = timed_local

    orig_trunc = plm_mod.truncate

    def timed_trunc(df, **kw):
        t0 = time.perf_counter()
        out = orig_trunc(df, **kw)
        print(f"  truncate: {time.perf_counter()-t0:.2f}s", file=sys.stderr)
        return out

    plm_mod.truncate = timed_trunc

    t0 = time.perf_counter()
    res = plm_mod.plm(g, max_iter=max_iter)
    labels = res.labels.persist()
    labels.count()
    t1 = time.perf_counter()
    score = nmi(labels, lfr_truth.withColumnRenamed("community", "label"))
    t2 = time.perf_counter()
    print(
        f"plm total: {t1-t0:.2f}s  nmi: {score:.4f} ({t2-t1:.2f}s)  "
        f"levels={res.levels} sweeps={res.sweeps}",
        file=sys.stderr,
    )
    spark.stop()


if __name__ == "__main__":
    main()
