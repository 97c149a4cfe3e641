"""Probe per-sweep cost of the PLM move phase under config variants.

Usage: python scripts/plm_sweep_probe.py [aqe=0|1] [npart]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from networkit_spark.generators import lfr
from networkit_spark.graph import Graph
from networkit_spark.operators import plm as plm_mod
from networkit_spark.session import get_spark


def main():
    aqe = sys.argv[1] if len(sys.argv) > 1 else "1"
    npart = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(
        "plm-probe", cores=32, shuffle_partitions=npart,
        extra_conf={
            "spark.local.dir": "/dev/shm/spark",
            "spark.sql.adaptive.enabled": "true" if aqe == "1" else "false",
        },
    )
    lfr_edges, _ = lfr(spark, 20000, mu=0.1, seed=42)
    lfr_edges = lfr_edges.persist()
    lfr_edges.count()
    g = Graph.from_edges(lfr_edges, directed=False)
    total = g.total_edge_weight()
    init = g.vertices().selectExpr("id", "id as label")

    t0 = time.perf_counter()
    labels, _, moves = plm_mod._move_phase(g, init, total, 1.0, 6)
    labels.count()
    dt = time.perf_counter() - t0
    print(
        f"aqe={aqe} npart={npart}: move_phase(6) {dt:.2f}s "
        f"({dt/6:.2f}s/sweep) moves={moves}",
        file=sys.stderr,
    )
    spark.stop()


if __name__ == "__main__":
    main()
