"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() binding AND its oracle_sql() twin on the same
sf dir, compare row count, column names, and order-insensitive values.

Usage: python scripts/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from networkit_spark.session import get_spark
from networkit_spark.sources.tables import TABLES


def norm_cell(x):
    if isinstance(x, float):
        if math.isnan(x):
            return "nan"
        return f"{x:.9g}"
    return str(x)


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    # The driver's correctness gate runs at sf0.01, so oracle_sql() pins
    # side-channel parquet paths (nondeterministic queries hand their own
    # labels to the property oracle) to the sf0.01 tag. When checking a
    # DIFFERENT sf dir locally, repoint those paths at this sf's files —
    # the Spark query writes them before the oracle reads them.
    tag = os.path.basename(os.path.normpath(sf_dir))
    if tag != "sf0.01":
        oracles = {
            name: sql.replace("_sf0.01.parquet", f"_{tag}.parquet")
            for name, sql in oracles.items()
        }

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spark = get_spark("parity", cores=int(os.environ.get("SPARK_TEST_CPUS", "8")),
                      shuffle_partitions=8)

    import time

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(srows)})")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            continue

        msgs = []
        if sorted(scols) != sorted(ocols):
            msgs.append(f"cols spark={scols} duck={ocols}")
        if len(srows) != len(orows):
            msgs.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if not msgs:
            sk = rows_key(srows, scols)
            ok = rows_key(orows, ocols)
            if sk != ok:
                diff = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
                msgs.append(f"values differ, first diffs: {diff}")
        if msgs:
            failures.append((name, "; ".join(msgs)))
            print(f"FAIL {name}: {'; '.join(msgs)}")
        else:
            print(f"OK   {name} ({len(srows)} rows, "
                  f"{time.monotonic() - t0:.1f}s)")

    print(f"\n{len(failures)} failures" if failures else "\nALL OK")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
