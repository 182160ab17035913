"""Weather-independent profile of an incremental near-dup probe batch:
Spark job count + shuffle bytes for process_batch, per family config.

Every Spark job is a serial driver barrier; the incremental probe is a
fixed-barrier job (its input is one shard), so its wall-clock is almost
entirely job_count x driver latency. Drive the count down and the probe
latency follows in any weather.

Usage:
    python scripts/profile_incremental.py [families ...]
defaults to profiling each single family plus the text trio.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _api(base: str, app_id: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/{path}") as r:
        return json.loads(r.read().decode())


def main() -> None:
    from pyspark.sql import functions as F

    from cc_net_spark.session import get_spark
    from cc_net_spark.streaming.incremental_neardup import IncrementalNearDup

    spark = get_spark(
        app_name="profile_incremental",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext
    base, app_id = sc.uiWebUrl, sc.applicationId

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select("vec_id", "embedding")
    dim = len(emb.select("embedding").first()["embedding"])

    configs = sys.argv[1:] or ["minhash", "embedding", "minhash+simhash+exact"]

    def snap():
        jobs = _api(base, app_id, "jobs")
        st = _api(base, app_id, "stages")
        return {
            "jobs": len(jobs),
            "tasks": sum(s.get("numCompleteTasks", 0) for s in st),
            "shuffle_write_mb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in st) / 1e6, 2
            ),
        }

    tmp = tempfile.mkdtemp(prefix="profile_inc_")
    try:
        for conf in configs:
            fams = tuple(conf.split("+"))
            is_emb = fams == ("embedding",)
            src = emb if is_emb else docs
            idc = "vec_id" if is_emb else "doc_id"
            root = os.path.join(tmp, conf.replace("+", "_"))
            nd = IncrementalNearDup(
                os.path.join(root, "state"), os.path.join(root, "out"),
                id_col=idc,
                **(
                    {"families": ("embedding",), "emb_dim": dim}
                    if is_emb
                    else {"text_col": "text", "families": fams}
                ),
            )
            nd.process_batch(src.filter(F.col(idc) % 2 == 0), 0)
            before = snap()
            nd.process_batch(src.filter(F.col(idc) % 2 == 1), 1)
            after = snap()
            delta = {k: round(after[k] - before[k], 2) for k in after}
            print(json.dumps({"families": conf, "phase": "probe_batch1", **delta}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
