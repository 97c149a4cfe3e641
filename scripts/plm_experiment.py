"""Experiment: fine-sweep count vs refine sweeps vs NMI/wall.

Usage: python scripts/plm_experiment.py FINE REFINE
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from networkit_spark.generators import lfr
from networkit_spark.graph import Graph
from networkit_spark.operators import plm as plm_mod
from networkit_spark.operators.quality import nmi
from networkit_spark.session import get_spark


def main():
    fine = int(sys.argv[1])
    refine = int(sys.argv[2])
    spark = get_spark(
        "plm-exp", cores=32, shuffle_partitions=32,
        extra_conf={"spark.local.dir": "/dev/shm/spark"},
    )
    lfr_edges, lfr_truth = lfr(spark, 20000, mu=0.1, seed=42)
    lfr_edges = lfr_edges.persist()
    lfr_edges.count()
    g = Graph.from_edges(lfr_edges, directed=False)

    t0 = time.perf_counter()
    res = plm_mod.plm(g, max_iter=fine)
    labels = res.labels
    if refine:
        total = g.total_edge_weight()
        labels, _, moves = plm_mod._move_phase(g, labels, total, 1.0, refine)
        print(f"refine moves: {moves}", file=sys.stderr)
    labels = labels.persist()
    labels.count()
    t1 = time.perf_counter()
    score = nmi(labels, lfr_truth.withColumnRenamed("community", "label"))
    t2 = time.perf_counter()
    print(
        f"fine={fine} refine={refine}: plm+refine {t1-t0:.2f}s nmi={score:.4f} "
        f"(nmi {t2-t1:.2f}s) sweeps={res.sweeps}",
        file=sys.stderr,
    )
    spark.stop()


if __name__ == "__main__":
    main()
