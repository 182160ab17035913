"""Same-session alternating A/B: does a small shuffle-partition override
inside small_batch_mode cut probe wall time?

Builds two independent state trees (A: stock SMALL_BATCH_CONFS,
B: stock + shuffle.partitions=N), then alternates timed probe batches
A,B,A,B,... so both shapes share the weather window. Each probe rep uses
fresh ids (same as bench) so reps stay comparable.

Usage: python scripts/probe_parts_ab.py [families] [parts] [pairs]
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
    from cc_net_spark.streaming import incremental_neardup as inc

    families = tuple((sys.argv[1] if len(sys.argv) > 1 else "minhash").split(","))
    parts = sys.argv[2] if len(sys.argv) > 2 else "8"
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(
        app_name="probe_parts_ab", master="local[32]", shuffle_partitions=32
    )
    import bench

    bench.warm_workers(spark, 32)
    tmp = tempfile.mkdtemp(prefix="probe_parts_ab_")
    try:
        if families == ("embedding",):
            emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            dim = len(emb.select("embedding").first()["embedding"])
            kwargs = {"id_col": "vec_id", "emb_dim": dim}
            idc = "vec_id"
            base = emb.select("vec_id", "embedding")
        else:
            kwargs = {"text_col": "text", "id_col": "doc_id"}
            idc = "doc_id"
            base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
                "doc_id", "text"
            )
        handlers = {}
        for label, sp in (("A", 0), ("B", int(parts))):
            d = os.path.join(tmp, label)
            handlers[label] = inc.IncrementalNearDup(
                os.path.join(d, "state"), os.path.join(d, "out"),
                families=families, small_batch_mode=True,
                small_batch_shuffle_parts=sp, **kwargs,
            )
            handlers[label].process_batch(base.filter(F.col(idc) % 2 == 0), 0)
        times: dict[str, list[float]] = {"A": [], "B": []}
        for rep in range(pairs):
            shard = base.filter(F.col(idc) % 2 == 1).withColumn(
                idc, F.col(idc) + (1 + rep) * 10_000_000
            )
            order = ("A", "B") if rep % 2 == 0 else ("B", "A")
            for label in order:
                t0 = time.time()
                handlers[label].process_batch(shard, 1 + rep)
                times[label].append(round(time.time() - t0, 3))
                print(f"rep {rep} {label}: {times[label][-1]}s", flush=True)
        print(json.dumps({
            "families": ",".join(families), "parts": parts,
            "A_stock": times["A"], "B_tuned": times["B"],
            "A_min": min(times["A"]), "B_min": min(times["B"]),
        }))
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
