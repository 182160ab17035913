"""Driver-style correctness sweep at an arbitrary SF.

Replicates the grading driver's gate (row count + column names +
order-insensitive exact values vs DuckDB oracles) at sf0.01 — the SF the
driver actually uses — whereas tests/test_entry_contract.py pins sf0.001.
Canonicalization is IMPORTED from that replica so the two surfaces can
never diverge on what "green" means.

Usage: python scripts/gate_sweep.py [sf_dir] [query ...]
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from tests.test_entry_contract import TABLES, canon

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def main() -> int:
    from pyspark.sql import SparkSession

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    unknown = ONLY - set(queries)
    if unknown:
        print(f"unknown queries: {sorted(unknown)}; known: {sorted(queries)}")
        return 2
    names = [n for n in sorted(queries) if not ONLY or n in ONLY]

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    failures = []
    for name in names:
        t0 = time.time()
        try:
            got = canon(queries[name](spark, SF_DIR).toPandas())
        except Exception as exc:  # noqa: BLE001 - report, keep sweeping
            print(f"FAIL {name}: spark raised {exc!r}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            exp = canon(con.execute(oracles[name]).df())
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {exc!r}")
            failures.append(name)
            continue
        status = "ok"
        if list(got.columns) != list(exp.columns):
            status = f"SCHEMA {list(got.columns)} != {list(exp.columns)}"
        elif len(got) != len(exp):
            status = f"ROWS {len(got)} != {len(exp)}"
        else:
            try:
                pd.testing.assert_frame_equal(
                    got, exp, check_dtype=False, atol=0, rtol=0
                )
            except AssertionError as exc:
                status = f"VALUES {str(exc).splitlines()[-1]}"
        if status != "ok":
            failures.append(name)
            print(f"FAIL {name}: {status}")
        else:
            print(f"ok   {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(names) - len(failures)}/{len(names)} green at {SF_DIR}")
    if failures:
        print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
