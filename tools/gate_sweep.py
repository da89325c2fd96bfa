#!/usr/bin/env python
"""Run every ``__spark_entry__.queries()`` gate against its DuckDB oracle —
the driver's correctness gate, reproducible locally.

Usage::

    python tools/gate_sweep.py [SF_DIR] [gate ...]

Defaults to ``/root/testdata/sf0.001`` and all gates.  Prints one line per
gate (rows spark/oracle, EQUAL/MISMATCH/NO_ORACLE) and a final tally;
exit code 1 on any mismatch or error.

Run it from anywhere — it inserts the repo root on sys.path the same way
the driver does, and intentionally does NOT chdir to the repo so
executor-side imports exercise the shipped-package path.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "documents events embeddings orders lineitem region nation customer "
    "supplier part".split()
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    fails: list[str] = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sorted(tuple(r) for r in sdf.collect())
            scols = sorted(sdf.columns)
        except Exception as exc:  # noqa: BLE001 - report and continue
            print(f"{name:28s} ERROR {type(exc).__name__}: {exc}", flush=True)
            fails.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(
                f"{name:28s} rows={len(srows):6d} NO_ORACLE (rows-only gate)"
                f"  {time.time() - t0:5.1f}s",
                flush=True,
            )
            continue
        ores = con.execute(sql)
        ocols = sorted(d[0] for d in ores.description)
        orows = sorted(tuple(r) for r in ores.fetchall())
        # driver compare: sort columns by name, then compare row values
        sidx = [sdf.columns.index(c) for c in scols]
        srows_sorted = sorted(tuple(r[i] for i in sidx) for r in srows)
        raw_cols = [d[0] for d in ores.description]
        oidx = [raw_cols.index(c) for c in ocols]
        orows_sorted = sorted(tuple(r[i] for i in oidx) for r in orows)
        ok = scols == ocols and srows_sorted == orows_sorted
        status = "EQUAL" if ok else "MISMATCH"
        if not ok:
            fails.append(name)
        print(
            f"{name:28s} rows={len(srows):6d}/{len(orows):6d} {status}"
            f"  {time.time() - t0:5.1f}s",
            flush=True,
        )
    print(
        f"== {len(fails)} failing of {len(only) or len(queries)} gates"
        + (f": {fails}" if fails else " — all green")
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
