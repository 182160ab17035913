"""List every Spark job (name, duration, inter-job gap) of one
incremental minhash probe batch at bench geometry (local[32], sf0.1
documents, small_batch_mode) via the UI REST API.

Usage: python scripts/probe_joblist.py [families-csv]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _api(base: str, app_id: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/{path}") as r:
        return json.loads(r.read().decode())


def _ts(s: str) -> float:
    return dt.datetime.strptime(
        s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
    ).timestamp()


def main() -> None:
    from pyspark.sql import functions as F

    from cc_net_spark.session import get_spark
    from cc_net_spark.streaming.incremental_neardup import IncrementalNearDup

    families = tuple((sys.argv[1] if len(sys.argv) > 1 else "minhash").split(","))
    spark = get_spark(
        app_name="probe_joblist", master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true"},
    )
    import bench

    bench.warm_workers(spark, 32)
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    tmp = tempfile.mkdtemp(prefix="probe_joblist_")
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
        kwargs = {}
        if families == ("embedding",):
            emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            dim = len(emb.select("embedding").first()["embedding"])
            kwargs = {"id_col": "vec_id", "emb_dim": dim}
            batch0 = emb.filter(F.col("vec_id") % 2 == 0).select(
                "vec_id", "embedding"
            )
            batch1 = emb.filter(F.col("vec_id") % 2 == 1).select(
                "vec_id", "embedding"
            )
        else:
            kwargs = {"text_col": "text", "id_col": "doc_id"}
            batch0 = docs.filter(F.col("doc_id") % 2 == 0)
            batch1 = docs.filter(F.col("doc_id") % 2 == 1)
        nd = IncrementalNearDup(
            os.path.join(tmp, "state"), os.path.join(tmp, "out"),
            families=families, small_batch_mode=True, **kwargs,
        )
        nd.process_batch(batch0, 0)
        before = len(_api(base, app_id, "jobs"))
        t0 = time.time()
        nd.process_batch(batch1, 1)
        wall = time.time() - t0
        time.sleep(0.6)
        jobs = sorted(
            (j for j in _api(base, app_id, "jobs") if j["jobId"] >= before),
            key=lambda j: j["jobId"],
        )
        prev_end = None
        total_gap = total_job = 0.0
        for j in jobs:
            st, en = _ts(j["submissionTime"]), _ts(j["completionTime"])
            gap = (st - prev_end) if prev_end is not None else 0.0
            prev_end = max(prev_end or en, en)
            total_gap += max(0.0, gap)
            total_job += en - st
            name = (j.get("description") or j["name"])[:100]
            print(
                f"job {j['jobId']:4d} {en - st:6.3f}s gap {max(0.0, gap):6.3f}s "
                f"tasks {j['numTasks']:4d}  {name}"
            )
        print(
            json.dumps(
                {
                    "families": ",".join(families),
                    "wall_s": round(wall, 3),
                    "jobs": len(jobs),
                    "job_s": round(total_job, 3),
                    "gap_s": round(total_gap, 3),
                }
            )
        )
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
