"""Benchmark harness.

Runs the engine's headline jobs at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {...per-job sec...}, "sf": ..., "throughput_clips_per_sec": N,
"scaling": {...}}.

Scaling evidence (BASELINE.json north rule; no real cluster in this
sandbox): the same clustering job runs at two parallelism levels —
local[N/4] and local[N] — on identical input; efficiency =
throughput(N) / (4 * throughput(N/4)). Controlled by
SPARK_GRAFT_SCALING=0/1 (default 1).

Usage: ``python bench.py`` or ``spark-submit --py-files cc_net_spark.zip bench.py``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CLIPS = int(os.environ.get("SPARK_GRAFT_CLIPS", "20000"))
# the scaling corpus is larger so per-core compute dominates fixed
# per-round costs (the honest strong-scaling regime for a 100 TB design)
N_SCALING = int(os.environ.get("SPARK_GRAFT_SCALING_CLIPS", "100000"))
DO_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") == "1"


def make_spark(cores: int) -> SparkSession:
    from cc_net_spark.session import get_spark

    return get_spark(
        app_name=f"cc_net_spark_bench_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(8, cores),
    )


def cluster_job(spark: SparkSession, clips_path: str) -> int:
    """The headline near-dup clustering job (signatures -> LSH -> verify ->
    exact pass -> substring pass -> CC -> cluster assignment)."""
    from cc_net_spark.operators import exact_dedup as ed
    from cc_net_spark.operators import minhash as mh
    from cc_net_spark.operators import substring as ss
    from cc_net_spark.operators.connected_components import (
        assign_clusters,
        connected_components,
    )
    from cc_net_spark.operators.pairs import candidate_pairs

    clips = spark.read.parquet(clips_path).select("clip_id", "transcript")
    sig = mh.shingle_signatures(clips, "transcript", "clip_id", num_perm=128)
    mh_pairs = mh.verify_jaccard(
        mh.minhash_candidate_pairs(sig, "clip_id", bands=32, rows_per_band=4),
        sig, "clip_id", threshold=0.5,
    ).select("id_a", "id_b")
    exact = candidate_pairs(
        clips.select("clip_id", ed.dedup_hash_udf(F.col("transcript")).alias("k")),
        ["k"], "clip_id", bucket_cap=200,
    )
    sub = ss.substring_candidate_pairs(
        clips, "transcript", "clip_id", length=30, winnow_window=21, gram_cap=100
    )
    edges = mh_pairs.unionByName(exact).unionByName(sub)
    comp = connected_components(edges)
    out = assign_clusters(clips.select("clip_id"), comp, "clip_id")
    return out.count()


def timed(fn, *args):
    t0 = time.time()
    res = fn(*args)
    return time.time() - t0, res


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="bench_clips_")
    clips_path = os.path.join(tmp, "clips.parquet")
    timings: dict[str, float] = {}
    extras: dict = {}

    spark = make_spark(CPUS)
    try:
        # untimed setup: materialize the synthetic clips corpus (no audio —
        # the clustering never touches the payload anyway)
        from cc_net_spark.sources import synth

        synth.generate_clips(spark, N_CLIPS, seed=42, with_audio=False).write.mode(
            "overwrite"
        ).parquet(clips_path)

        t, n = timed(cluster_job, spark, clips_path)
        timings["near_dup_cluster"] = round(t, 3)
        extras["throughput_clips_per_sec"] = round(N_CLIPS / t, 1)
        extras["clustered_rows"] = n

        # chunk-level exact dedup over the driver documents table
        from cc_net_spark import queries as Q

        t, _ = timed(lambda: Q.q_dedup_chunks_dropall(spark, SF_DIR).count())
        timings["dedup_chunks_dropall"] = round(t, 3)

        t, _ = timed(lambda: Q.q_dup_chunk_pairs(spark, SF_DIR).count())
        timings["dup_chunk_pairs"] = round(t, 3)

        t, _ = timed(lambda: Q.q_minhash_lsh_pairs(spark, SF_DIR).count())
        timings["minhash_lsh_docs"] = round(t, 3)

        t, _ = timed(lambda: Q.q_substring_pairs(spark, SF_DIR).count())
        timings["substring_pairs_docs"] = round(t, 3)

        from cc_net_spark.operators import ann

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        queries_df = emb.filter(F.col("vec_id") < 64)
        t, _ = timed(lambda: ann.brute_force_topk_matmul(queries_df, emb, k=10).count())
        timings["ann_matmul_topk"] = round(t, 3)
    finally:
        spark.stop()

    if DO_SCALING:
        # N vs 4N parallelism on the identical input (cluster stand-in)
        scaling_path = os.path.join(tmp, "clips_scaling.parquet")
        s0 = make_spark(CPUS)
        try:
            from cc_net_spark.sources import synth

            synth.generate_clips(s0, N_SCALING, seed=42, with_audio=False).write.mode(
                "overwrite"
            ).parquet(scaling_path)
        finally:
            s0.stop()
        lo_cores = max(1, CPUS // 4)
        scaling = {}
        for cores, key in ((lo_cores, "lo"), (CPUS, "hi")):
            s = make_spark(cores)
            try:
                t, _ = timed(cluster_job, s, scaling_path)
            finally:
                s.stop()
            scaling[key] = {
                "cores": cores,
                "seconds": round(t, 3),
                "clips_per_sec": round(N_SCALING / t, 1),
            }
        ratio = scaling["hi"]["clips_per_sec"] / scaling["lo"]["clips_per_sec"]
        scaling["n_clips"] = N_SCALING
        scaling["speedup"] = round(ratio, 3)
        scaling["efficiency"] = round(ratio / (CPUS / lo_cores), 3)
        extras["scaling"] = scaling

    shutil.rmtree(tmp, ignore_errors=True)

    result = {
        "metric": "near-dup dedup throughput (clips/sec) + headline op latencies",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "n_clips": N_CLIPS,
        **extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
