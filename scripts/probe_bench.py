"""Micro-bench for the incremental near-dup probe (the bench.py row).

Replicates bench.py's incremental_neardup_probe section: batch 0 builds
history state, batch 1 (timed) probes it. Run:

    python scripts/probe_bench.py [sf_dir] [reps]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1 and not sys.argv[1].isdigit()
        else "/root/testdata/sf0.1"
    )
    reps = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 2
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from cc_net_spark.streaming.incremental_neardup import IncrementalNearDup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs.count()  # warm
    for rep in range(reps):
        tmp = tempfile.mkdtemp(prefix="probe_bench_")
        nd = IncrementalNearDup(
            os.path.join(tmp, "state"), os.path.join(tmp, "out"),
            text_col="text", id_col="doc_id",
        )
        t0 = time.time()
        nd.process_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
        t_build = time.time() - t0
        t0 = time.time()
        nd.process_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)
        t_probe = time.time() - t0
        print(f"rep {rep}: build {t_build:.2f}s probe {t_probe:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
