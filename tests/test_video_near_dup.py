"""Video near-dup family: sampled-frame dHash words, planted-corpus
recall & precision, shape-mismatch rejection, drop metrics."""

import numpy as np
from pyspark.sql import functions as F

from cc_net_spark.multimodal import video as vd

N = 32  # 8 groups of 4


def test_planted_corpus_pairs_exact(spark):
    videos = vd.generate_video_corpus(spark, N, seed=42)
    got = {
        (r["id_a"], r["id_b"]) for r in vd.video_near_dup_pairs(videos).collect()
    }
    expected = {(f"vid-{4*g:06d}", f"vid-{4*g+1:06d}") for g in range(N // 4)}
    assert got == expected


def test_psnr_verify_rejects_unrelated_and_mismatched(spark):
    videos = vd.generate_video_corpus(spark, 8, seed=42)
    pairs = spark.createDataFrame(
        [("vid-000000", "vid-000001"), ("vid-000000", "vid-000002")],
        "id_a string, id_b string",
    )
    rows = {
        (r["id_a"], r["id_b"]): r["psnr_db"]
        for r in vd.pair_video_psnr(pairs, videos).collect()
    }
    assert rows[("vid-000000", "vid-000001")] >= 30.0
    assert rows[("vid-000000", "vid-000002")] < 30.0


def test_fingerprints_skip_stub_and_sample_stride(spark):
    videos = vd.generate_video_corpus(spark, 8, seed=42)
    fp = vd.video_fingerprints(videos, every=2).collect()
    ids = {r["vid_id"] for r in fp}
    assert "vid-000003" not in ids and "vid-000007" not in ids  # stubs skipped
    per = {}
    for r in fp:
        per.setdefault(r["vid_id"], []).append(r["frame_idx"])
    for v, idxs in per.items():
        assert sorted(idxs) == [0, 2, 4]  # 6 frames, every 2nd


def test_drop_metrics_surface_on_hot_word(spark):
    base = vd.generate_video_corpus(spark, 4, seed=42).filter(
        F.col("vid_id") == "vid-000000"
    )
    hot = base
    for i in range(20):
        hot = hot.unionByName(
            base.withColumn("vid_id", F.concat(F.lit(f"dup-{i:03d}-"), "vid_id"))
        )
    pairs, metrics = vd.video_near_dup_pairs(hot, bucket_cap=10, with_metrics=True)
    assert metrics.n_buckets_dropped >= 1
    assert metrics.n_rows_dropped > 0
    assert pairs.count() == 0
    # observe mode must report the same counters
    pairs_o, resolve = vd.video_near_dup_pairs(
        hot, bucket_cap=10, with_metrics="observe"
    )
    assert pairs_o.count() == 0
    assert resolve().__dict__ == metrics.__dict__
