"""Two-parallelism-level scaling evidence for the north rule.

The rule's criterion — "run at two cluster sizes (N and 4N executors)
with throughput scaling efficiency ≥ 0.8" — cannot use a real cluster in
this sandbox; the sanctioned evidence (round-1 instructions) is the SAME
job at two local parallelism levels on the same input:

    efficiency = (throughput at 4N cores / throughput at N cores) / 4

Methodology (kept honest):
- each level runs in its own subprocess (fresh JVM), CPU-pinned with
  `taskset` to exactly its core budget — GC, shuffle, IO and codegen
  threads all share the budget, like a real N-core cluster slice;
- identical input parquet, identical plan (fixed shuffle partitioning
  across levels — scaling = more concurrent task slots, the same thing
  adding executors does);
- the job is the engine's headline superstep workload: 5 fixed PageRank
  supersteps (reference default semantics, NO_SINK_HANDLING) over a
  deduped RMAT power-law graph via networkit_spark.operators.pagerank.

The FULL level curve is reported, not just the headline pair: a single
shared-memory box saturates its DRAM bandwidth around 8 threads, so
core-scaling flattens there — that is a property of the sandbox host,
not of the plan (on a real cluster, 4N executors bring 4N× memory and
network bandwidth; the per-superstep plan is one shuffle join + one
partial/final agg, both of which scale with executors).

Usage:
    python scripts/scaling_bench.py                 # N=1 vs 4N=4 + curve
    SCALE_LEVELS=2,8 python scripts/scaling_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RMAT_SCALE = int(os.environ.get("SCALE_RMAT", "22"))
EDGE_FACTOR = int(os.environ.get("SCALE_EDGE_FACTOR", "16"))
ITERS = 5
REPEATS = int(os.environ.get("SCALE_REPEATS", "3"))
# a run whose pinned cores lost more than this fraction of CPU time to
# the hypervisor during the measured section is DIRTY and gets re-run
DIRTY_STEAL_PCT = float(os.environ.get("SCALE_DIRTY_STEAL_PCT", "2.0"))
MAX_ATTEMPTS = int(os.environ.get("SCALE_MAX_ATTEMPTS", "3"))
SHUFFLE_PARTITIONS = 32
LEVELS = [int(x) for x in os.environ.get("SCALE_LEVELS", "1,2,4,8").split(",")]
# The headline pair is PRE-DECLARED (default 1->4), never chosen after
# the fact: a max-over-measured-pairs headline would cherry-pick the
# most favorable configuration. All measured N->4N pairs are still
# reported alongside.
HEADLINE_N = int(os.environ.get("SCALE_HEADLINE_N", "1"))

WORKER_CONF = {
    # AQE's partition coalescing folds the iterative shuffles below the
    # core count on these input sizes — fixed partitioning is the point
    # of the experiment, so AQE is off for the measured job.
    "spark.sql.adaptive.enabled": "false",
    # shuffle spill dir on tmpfs: the sandbox's / disk would otherwise
    # bottleneck every level equally and mask compute scaling.
    "spark.local.dir": "/dev/shm/spark",
}


def _stat_ticks(cpus):
    """(busy, steal, total) jiffies summed over `cpus` from /proc/stat."""
    busy = steal = total = 0
    with open("/proc/stat") as fh:
        for line in fh:
            if not line.startswith("cpu") or line.startswith("cpu "):
                continue
            parts = line.split()
            idx = int(parts[0][3:])
            if idx not in cpus:
                continue
            vals = [int(x) for x in parts[1:]]
            total += sum(vals)
            steal += vals[7] if len(vals) > 7 else 0
            busy += vals[0] + vals[1] + vals[2]  # user+nice+system
    return busy, steal, total


def _occupancy(cpus, secs: float = 2.0):
    """(busy_pct, steal_pct) on `cpus` over a `secs` sample — the
    pre-run probe that picks a quiet core window."""
    b0, s0, t0 = _stat_ticks(cpus)
    time.sleep(secs)
    b1, s1, t1 = _stat_ticks(cpus)
    dt = max(t1 - t0, 1)
    return 100.0 * (b1 - b0) / dt, 100.0 * (s1 - s0) / dt


def worker(cores: int, edges_path: str):
    from networkit_spark.graph import Graph
    from networkit_spark.operators.pagerank import (
        NO_SINK_HANDLING,
        PreparedPageRank,
        pagerank_fixed,
    )
    from networkit_spark.session import get_spark

    conf = dict(WORKER_CONF)
    # a real N-core executor's JVM sees N processors; without the hint
    # the pinned JVM sizes its GC/JIT/netty pools for all 32 host cores
    # and thrashes the small slice
    conf["spark.driver.extraJavaOptions"] = (
        f"-XX:ActiveProcessorCount={cores}"
    )
    spark = get_spark(f"scaling_{cores}", cores=cores,
                      shuffle_partitions=SHUFFLE_PARTITIONS,
                      extra_conf=conf)
    edges = spark.read.parquet(edges_path)
    g = Graph.from_edges(edges, directed=True, num_partitions=SHUFFLE_PARTITIONS)
    m = edges.count()

    # One-time preparation (normalized, src-partitioned edge table — the
    # bucketed Iceberg table at scale) is NOT part of superstep throughput.
    prep = PreparedPageRank(g)
    # warmup: exercise the superstep machinery (JVM/codegen), not measured
    pagerank_fixed(g, n_iter=1, distribute_sinks=NO_SINK_HANDLING, prepared=prep)

    # ONE timed run per worker invocation; the orchestrator interleaves
    # level order across repeats and takes the per-level MEDIAN, so a
    # hypervisor-steal burst on this shared sandbox host lands on all
    # levels with equal probability instead of penalizing whichever
    # level happened to own the noisy window.
    # steal accounting on OUR pinned cores over the measured section:
    # steal jiffies / elapsed wall converts hypervisor interference from
    # an anecdote into a per-run number the orchestrator can act on.
    my_cpus = set(os.sched_getaffinity(0))
    _, st0, _ = _stat_ticks(my_cpus)
    t0 = time.perf_counter()
    scores = pagerank_fixed(g, n_iter=ITERS, distribute_sinks=NO_SINK_HANDLING,
                            checkpoint_every=ITERS, prepared=prep)
    n = scores.count()
    dt = time.perf_counter() - t0
    _, st1, _ = _stat_ticks(my_cpus)
    hz = os.sysconf("SC_CLK_TCK")
    steal_pct = 100.0 * (st1 - st0) / max(dt * hz * len(my_cpus), 1.0)
    print(json.dumps({
        "cores": cores, "edges": m, "vertices": n, "iters": ITERS,
        "wall_sec": round(dt, 3),
        "edges_per_sec": round(ITERS * m / dt, 1),
        "supersteps_per_sec": round(ITERS / dt, 4),
        "steal_pct": round(steal_pct, 2),
        "pinned": sorted(my_cpus),
    }))
    spark.stop()


def orchestrate():
    # deterministic input cached across invocations (same generator, same
    # seed): re-running the bench after a noisy session skips the gen step
    edges_path = f"/tmp/scaling_rmat{RMAT_SCALE}x{EDGE_FACTOR}.parquet"

    if not os.path.exists(os.path.join(edges_path, "_SUCCESS")):
        # run generation in its OWN process: spark.stop() ends the
        # SparkContext but the py4j gateway JVM lives until the owning
        # python process exits — an in-process gen step leaves a 32-core
        # 18-GB-heap JVM GC-churning through every pinned measurement
        # (observed: 4-core wall 127.7s with the stray JVM vs ~51s
        # without; the 0.787-vs-0.817 session variance traced to exactly
        # this, since the gen step only runs when /tmp lost the cache)
        rc = subprocess.call([sys.executable, __file__, "--gen", edges_path])
        if rc != 0:
            raise RuntimeError("input generation failed")

    have_taskset = shutil.which("taskset") is not None

    n_cpu = os.cpu_count() or 32

    def pick_window(cores: int) -> list[int]:
        """Pick the currently-quietest window of `cores` consecutive CPUs.

        This host's hypervisor steal comes in multi-minute bursts that
        WANDER across the core map (measured 2026-08-17: the identical
        8-core worker ran 306-315s pinned 24-31 vs 47.6s pinned 4-11 in
        one window, then 393s pinned 2-9 in another). A fixed pin base
        therefore measures whichever tenant happens to share those
        cores, not the plan — so each run probes candidate windows
        (steal + foreign busy over 2s, cores 0-1 excluded for
        IRQ/housekeeping) and takes the quietest."""
        cands = []
        for base in range(2, n_cpu - cores + 1, max(cores, 4)):
            cands.append(list(range(base, base + cores)))
        if not cands:
            cands = [list(range(min(cores, n_cpu)))]
        scored = []
        for w in cands:
            busy, steal = _occupancy(set(w))
            scored.append((busy + steal, w))
            print(f"  probe cores {w[0]}-{w[-1]}: busy+steal={busy + steal:.1f}%",
                  file=sys.stderr)
        return min(scored)[1]

    def run_once(cores: int) -> dict:
        """One fresh-JVM measurement; re-runs (new window probe each
        time) while the measured section saw > {DIRTY}% steal on its
        pinned cores, keeping the cleanest attempt."""
        attempts = []
        for att in range(MAX_ATTEMPTS):
            cmd = [sys.executable, __file__, "--worker", str(cores), edges_path]
            if have_taskset:
                w = pick_window(cores)
                cmd = ["taskset", "-c", f"{w[0]}-{w[-1]}"] + cmd
            out = subprocess.run(cmd, capture_output=True, text=True, check=True)
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            attempts.append(r)
            if r.get("steal_pct", 0.0) <= DIRTY_STEAL_PCT:
                break
            print(f"  dirty run (steal {r['steal_pct']}% > {DIRTY_STEAL_PCT}%), "
                  f"attempt {att + 1}/{MAX_ATTEMPTS}", file=sys.stderr)
        best = min(attempts, key=lambda r: r.get("steal_pct", 0.0))
        best["attempts"] = len(attempts)
        return best

    # Interleaved repeats: round-robin over the levels REPEATS times
    # (fresh pinned JVM per run), then per-level MEDIAN. Interleaving +
    # median is the steal mitigation: interference bursts are multi-
    # minute, so consecutive same-level runs would share the same noise
    # window while interleaved runs spread it across levels.
    # Full repeat count for the pre-declared headline levels; the other
    # curve levels are context and get 2 repeats (median of 2 = mean).
    reps_for = {
        c: REPEATS if c in (HEADLINE_N, 4 * HEADLINE_N) else min(REPEATS, 2)
        for c in LEVELS
    }
    raw: dict[int, list[dict]] = {c: [] for c in LEVELS}
    for rep in range(REPEATS):
        for cores in LEVELS:
            if rep >= reps_for[cores]:
                continue
            r = run_once(cores)
            raw[cores].append(r)
            print(f"rep={rep} cores={cores} (pinned={have_taskset}): {r}",
                  file=sys.stderr)

    import statistics

    results = {}
    for cores, runs in raw.items():
        walls = sorted(r["wall_sec"] for r in runs)
        med = statistics.median(walls)
        m = runs[0]["edges"]
        results[cores] = {
            "cores": cores,
            "edges": m,
            "vertices": runs[0]["vertices"],
            "iters": ITERS,
            "wall_sec": round(med, 3),
            "wall_all": walls,
            "wall_spread_pct": round(100 * (walls[-1] - walls[0]) / walls[0], 1),
            "edges_per_sec": round(ITERS * m / med, 1),
            "supersteps_per_sec": round(ITERS / med, 4),
            "repeats": len(walls),
            "steal_pct_all": [r.get("steal_pct", 0.0) for r in runs],
            "max_steal_pct": max(r.get("steal_pct", 0.0) for r in runs),
        }

    thr = {c: r["edges_per_sec"] for c, r in results.items()}
    effs = {
        f"{n}->{4 * n}": round((thr[4 * n] / thr[n]) / 4, 3)
        for n in LEVELS if 4 * n in thr
    }
    headline_pair = f"{HEADLINE_N}->{4 * HEADLINE_N}"
    headline = effs.get(headline_pair)
    summary = {
        "job": f"pagerank_{ITERS}iter_rmat2^{RMAT_SCALE}x{EDGE_FACTOR}",
        "edges": results[LEVELS[0]]["edges"],
        "pinned": have_taskset,
        "levels": results,
        "efficiencies": effs,
        "headline_pair": headline_pair,
        "scaling_efficiency": headline,
        "criterion": "(thr_4N / thr_N) / 4 >= 0.8",
        "pass": headline is not None and headline >= 0.8,
    }
    print(json.dumps(summary))

    rows = "\n".join(
        f"| {c} | {r['wall_sec']} | {r['wall_spread_pct']}% | {r['max_steal_pct']}% | {r['edges_per_sec']:,.0f} | {r['supersteps_per_sec']} |"
        for c, r in sorted(results.items())
    )
    eff_rows = "\n".join(
        f"| {k} | {v} |{' **(headline, pre-declared)**' if k == headline_pair else ''}"
        for k, v in effs.items()
    )
    with open(os.path.join(REPO, "SCALING.md"), "w") as fh:
        fh.write(f"""# Scaling evidence (two parallelism levels, same input)

North-rule criterion: throughput scaling efficiency >= 0.8 between cluster
sizes N and 4N. Sandbox evidence (per round-1 instructions): the SAME job on
the SAME input at multiple CPU-pinned parallelism levels (taskset + fresh
JVM per level, identical fixed shuffle partitioning = {SHUFFLE_PARTITIONS}).

Job: {ITERS}-superstep fixed PageRank (reference default semantics) over a
deduped RMAT 2^{RMAT_SCALE}x{EDGE_FACTOR} power-law graph
({summary['edges']:,} arcs) read from parquet, via
networkit_spark.operators.pagerank (join + partial/final agg per superstep,
deferred lineage truncation every {ITERS} supersteps).

| cores | wall median (s) | spread max/min | worst steal | edges/s | supersteps/s |
|---|---|---|---|---|---|
{rows}

| N -> 4N | efficiency (thr_4N/thr_N)/4 |
|---|---|
{eff_rows}

**Headline pair {headline_pair} (pre-declared, not selected after
measurement): efficiency = {headline}**
{'PASS' if summary['pass'] else 'FAIL'} (criterion >= 0.8).

Methodology: each level is a fresh CPU-pinned JVM; the {REPEATS} repeats
are INTERLEAVED round-robin across levels and each level reports its
MEDIAN wall time (spread column = (max-min)/min over the repeats). This
shared sandbox host shows multi-minute hypervisor-steal bursts that
WANDER across the core map (measured: the identical 8-core worker ran
306-315s on cores 24-31 vs 47.6s on cores 4-11 in one window, 393s on
cores 2-9 in another), so noise is handled by MEASUREMENT, not hope:
every run first probes candidate core windows (2s busy+steal sample)
and pins to the quietest; the worker then reads /proc/stat around the
timed section and reports the steal its own cores actually suffered
("worst steal" column); a run over {DIRTY_STEAL_PCT}% steal is
discarded and re-run on a freshly probed window (up to {MAX_ATTEMPTS}
attempts, cleanest kept). The
full core curve is reported deliberately: beyond ~8 threads this single
shared-memory host saturates DRAM bandwidth, so core-scaling flattens —
a property of the sandbox box, not the plan. The per-superstep plan is
one shuffle hash join plus one partial/final aggregation; on a real
cluster 4N executors bring 4N x memory + network bandwidth with no
shared-bus ceiling, which is what the N->4N executor criterion measures.

Reproduce: `python scripts/scaling_bench.py`
""")
    return summary


def generate_input(edges_path: str):
    from networkit_spark.generators import rmat
    from networkit_spark.session import get_spark

    spark = get_spark("scaling_gen", cores=os.cpu_count() or 8,
                      extra_conf=WORKER_CONF)
    rm = rmat(spark, scale=RMAT_SCALE, edge_factor=EDGE_FACTOR).dropDuplicates(["src", "dst"])
    rm.write.mode("overwrite").parquet(edges_path)
    m = rm.sparkSession.read.parquet(edges_path).count()
    print(f"input: RMAT 2^{RMAT_SCALE}x{EDGE_FACTOR}, {m} deduped arcs",
          file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--gen":
        generate_input(sys.argv[2])
        sys.exit(0)
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
    else:
        orchestrate()
