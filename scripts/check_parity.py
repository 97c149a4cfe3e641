"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() binding AND its oracle_sql() twin on the same
sf dir, compare row count, column names, and order-insensitive values.

Usage: python scripts/check_parity.py [sf_dir] [query ...]

Set PARITY_JSON=/path/out.json to also write one record per query in
the driver's CORRECTNESS shape (rows_match / schema_match / hash_match /
spark_rows / oracle_rows / err) — the committed full-surface artifact
(PARITY_r{N}_*.json).
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

    import json
    import time

    records: dict[str, dict] = {}
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        records[name] = rec
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            rec["err"] = f"spark: {e}"
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            rec["err"] = "no oracle"
            print(f"SKIP {name}: no oracle (rows={len(srows)})")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            rec["oracle_rows"] = len(orows)
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            rec["err"] = f"duckdb: {e}"
            print(f"FAIL {name}: duckdb error: {e}")
            continue

        msgs = []
        rec["schema_match"] = sorted(scols) == sorted(ocols)
        if not rec["schema_match"]:
            msgs.append(f"cols spark={scols} duck={ocols}")
        rec["rows_match"] = len(srows) == len(orows)
        if not rec["rows_match"]:
            msgs.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if not msgs:
            sk = rows_key(srows, scols)
            ok = rows_key(orows, ocols)
            rec["hash_match"] = sk == ok
            if sk != ok:
                diff = [(a, b) for a, b in zip(sk, ok) if a != b][:3]
                msgs.append(f"values differ, first diffs: {diff}")
        if msgs:
            failures.append((name, "; ".join(msgs)))
            print(f"FAIL {name}: {'; '.join(msgs)}")
        else:
            print(f"OK   {name} ({len(srows)} rows, "
                  f"{time.monotonic() - t0:.1f}s)")

    out = os.environ.get("PARITY_JSON")
    if out:
        with open(out, "w") as fh:
            json.dump(records, fh, indent=2)
        print(f"wrote {out} ({len(records)} queries)")

    print(f"\n{len(failures)} failures" if failures else "\nALL OK")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
