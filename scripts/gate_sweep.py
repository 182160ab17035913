"""Driver-style correctness sweep at an arbitrary SF.

Replicates the grading driver's gate (row count + column names +
order-insensitive exact values vs DuckDB oracles) at sf0.01 — the SF the
driver actually uses — whereas tests/test_entry_contract.py pins sf0.001.

Usage: python scripts/gate_sweep.py [sf_dir] [query ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

import __spark_entry__ as entrymod

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    sort_cols = [c for c in df.columns if not pd.api.types.is_float_dtype(df[c])]
    sort_cols += [c for c in df.columns if pd.api.types.is_float_dtype(df[c])]
    return df.sort_values(by=sort_cols).reset_index(drop=True)


def main() -> int:
    from pyspark.sql import SparkSession

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
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = [n for n in sorted(queries) if not ONLY or n in ONLY]
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
