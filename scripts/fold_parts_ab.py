"""Same-session alternating A/B of the small-fold planner
(IncrementalClusters small_fold_shuffle_parts): pre-writes N probe
batches with one near-dup handler, then folds each batch into TWO
independent cluster states — A with the override disabled, B with the
default — timing each per-batch fold. A,B order alternates per rep so
both shapes share the weather window.

Usage: python scripts/fold_parts_ab.py [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from cc_net_spark.session import get_spark
    from cc_net_spark.streaming import incremental_clusters as icmod
    from cc_net_spark.streaming.incremental_neardup import IncrementalNearDup

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(
        app_name="fold_parts_ab", master="local[32]", shuffle_partitions=32
    )
    import bench

    bench.warm_workers(spark, 32)
    tmp = tempfile.mkdtemp(prefix="fold_parts_ab_")
    orig_cls = icmod.IncrementalClusters

    class NoSmallFold(orig_cls):
        def __init__(self, *a, **k):
            k["small_fold_shuffle_parts"] = 0
            super().__init__(*a, **k)

    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
        nd = IncrementalNearDup(
            os.path.join(tmp, "state"), os.path.join(tmp, "out"),
            text_col="text", id_col="doc_id", small_batch_mode=True,
        )
        out = os.path.join(tmp, "out")
        states = {"A": os.path.join(tmp, "csA"), "B": os.path.join(tmp, "csB")}
        times: dict[str, list[float]] = {"A": [], "B": []}
        for rep in range(reps + 1):  # rep 0: the batch-0 backfill fold
            if rep == 0:
                nd.process_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
            else:
                shard = docs.filter(F.col("doc_id") % 2 == 1).withColumn(
                    "doc_id", F.col("doc_id") + rep * 10_000_000
                )
                nd.process_batch(shard, rep)
            order = ("A", "B") if rep % 2 == 0 else ("B", "A")
            for label in order:
                icmod.IncrementalClusters = (
                    NoSmallFold if label == "A" else orig_cls
                )
                t0 = time.time()
                folded = icmod.fold_new_batches(
                    spark, out, states[label], id_col="doc_id"
                )
                dt = round(time.time() - t0, 3)
                assert folded == [rep], (label, rep, folded)
                times[label].append(dt)
                print(f"fold batch {rep} {label}: {dt}s", flush=True)
        # skip the backfill fold (rep 0) in the summary: bench times
        # post-backfill folds only
        print(json.dumps({
            "A_disabled": times["A"][1:], "B_default": times["B"][1:],
            "A_min": min(times["A"][1:]), "B_min": min(times["B"][1:]),
        }))
        # parity: both states resolve every id identically
        icmod.IncrementalClusters = orig_cls
        ida = icmod.IncrementalClusters(states["A"], id_col="doc_id")
        idb = icmod.IncrementalClusters(states["B"], id_col="doc_id")
        all_ids = spark.read.parquet(
            os.path.join(out, "flags")
        ).select("doc_id")
        ra = sorted(map(tuple, ida.resolve(spark, all_ids).collect()))
        rb = sorted(map(tuple, idb.resolve(spark, all_ids).collect()))
        print("parity:", "OK" if ra == rb else "MISMATCH", len(ra), "rows")
    finally:
        icmod.IncrementalClusters = orig_cls
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
