"""Synthetic corpus determinism + audio codec/invariant tests
(input contract: decoded-PCM allclose SNR >= 30 dB, transcript equality)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cc_net_spark.multimodal import audio as au
from cc_net_spark.sources import synth


def test_wav_roundtrip():
    rng = np.random.default_rng(0)
    pcm = rng.uniform(-0.9, 0.9, size=4000).astype(np.float32)
    blob = au.wav_encode_pcm16(pcm, 16000)
    sr, out = au.wav_decode_pcm16(blob)
    assert sr == 16000 and len(out) == 4000
    assert au.snr_db(pcm, out) > 60  # only quantization noise


def test_stub_codecs_raise():
    with pytest.raises(NotImplementedError):
        au.decode_clip("flac", b"xxxx")
    with pytest.raises(NotImplementedError):
        au.decode_clip("opus", b"xxxx")
    with pytest.raises(ValueError):
        au.decode_clip("mp9", b"xxxx")


def test_generator_is_deterministic_and_partition_invariant(spark):
    a = synth.generate_clips(spark, 64, seed=42, partitions=2).orderBy("clip_id").collect()
    b = synth.generate_clips(spark, 64, seed=42, partitions=7).orderBy("clip_id").collect()
    assert [r["transcript"] for r in a] == [r["transcript"] for r in b]
    assert [bytes(r["bytes"]) for r in a] == [bytes(r["bytes"]) for r in b]
    # different seed differs
    c = synth.generate_clips(spark, 64, seed=43, partitions=2).orderBy("clip_id").collect()
    assert [r["transcript"] for r in a] != [r["transcript"] for r in c]


def test_planted_structure(spark):
    df = synth.generate_clips(spark, 32, seed=42, include_hot=True).cache()
    rows = {r["clip_id"]: r for r in df.collect()}
    from cc_net_spark.functions.normalize import normalize_for_dedup

    def norm(t):
        return "\n".join(normalize_for_dedup(l) for l in t.split("\n"))

    for g in range(4):
        ids = [synth._clip_id(8 * g + r) for r in range(8)]
        # exact duplicate
        assert rows[ids[0]]["transcript"] == rows[ids[1]]["transcript"]
        # normalization variant: differs raw, equal normalized
        assert rows[ids[0]]["transcript"] != rows[ids[2]]["transcript"]
        assert norm(rows[ids[0]]["transcript"]) == norm(rows[ids[2]]["transcript"])
        # near-dup: most tokens shared
        base_toks = set(rows[ids[0]]["transcript"].split())
        near_toks = set(rows[ids[3]]["transcript"].split())
        assert len(base_toks & near_toks) / len(base_toks) > 0.8
        # substring overlap: a long base paragraph embedded verbatim
        donor = max(rows[ids[0]]["transcript"].split("\n"), key=len)
        assert donor in rows[ids[4]]["transcript"]
        assert len(normalize_for_dedup(donor)) >= 50
        # hot paragraph on role 7
        assert synth.HOT_PARAGRAPH in rows[ids[7]]["transcript"]


def test_audio_invariants_within_clusters(spark):
    df = synth.generate_clips(spark, 40, seed=42)
    pairs = synth.expected_dup_pairs(spark, 40).select(
        F.col("clip_id_a").alias("id_a"), F.col("clip_id_b").alias("id_b"), "kind"
    )
    res = au.pair_audio_invariants(pairs.select("id_a", "id_b"), df).collect()
    by_pair = {(r["id_a"], r["id_b"]): r for r in res}
    kinds = {(r["id_a"], r["id_b"]): r["kind"] for r in pairs.collect()}
    assert len(by_pair) == len(kinds)
    for key, r in by_pair.items():
        # same planted PCM (±45dB noise) => SNR >= 30 dB for every cluster pair
        assert r["pcm_ok"], (key, r["snr_db"])
        if kinds[key] == "exact_paragraph":
            assert r["transcript_equal"], key


def test_audio_features_real(spark):
    df = synth.generate_clips(spark, 8, seed=42)
    feats = {r["clip_id"]: r for r in au.audio_features(df).collect()}
    assert len(feats) == 8
    for r in feats.values():
        assert r["rms"] is not None and 0.0 < r["rms"] < 1.0
        assert r["spectral_centroid"] > 0.0


def test_expected_tables_consistent(spark):
    n = 80
    pairs = synth.expected_dup_pairs(spark, n)
    clusters = synth.expected_clusters(spark, n)
    assert pairs.count() == (n // 8) * 10
    assert clusters.count() == n
    # pairs lie within expected clusters
    joined = (
        pairs.join(
            clusters.withColumnRenamed("clip_id", "clip_id_a").withColumnRenamed(
                "cluster_id", "ca"
            ),
            "clip_id_a",
        ).join(
            clusters.withColumnRenamed("clip_id", "clip_id_b").withColumnRenamed(
                "cluster_id", "cb"
            ),
            "clip_id_b",
        )
    )
    assert joined.filter(F.col("ca") != F.col("cb")).count() == 0


def test_audio_near_dup_exact_planted_pairs(spark):
    """Payload-level near-dup pass (occupancy-fingerprint buckets + SNR
    verify) finds EXACTLY the planted intra-cluster pairs: recall 1.0
    (roles 0-4 share the group PCM at ~45 dB SNR) and precision 1.0
    (coarse occupancy collisions between unrelated clips are rejected by
    the ~0 dB pairwise SNR)."""
    from cc_net_spark.multimodal.audio import audio_near_dup_pairs

    n = 160
    clips = synth.generate_clips(spark, n, seed=42, with_audio=True)
    got = {(r["id_a"], r["id_b"]) for r in audio_near_dup_pairs(clips).collect()}
    exp = {
        (r["clip_id_a"], r["clip_id_b"])
        for r in synth.expected_dup_pairs(spark, n).collect()
    }
    assert got == exp
    snrs = audio_near_dup_pairs(clips).collect()
    assert all(r["snr_db"] >= 30.0 for r in snrs)


def test_paired_fingerprint_keys_raise_bucket_entropy(spark):
    """Time-paired occupancy words (Haitsma-Kalker sequence keys) spread
    the candidate key space: more distinct buckets, no larger hot bucket
    — the r2 verdict's 16-bit-entropy watch-item, addressed."""
    import pyspark.sql.functions as F

    from cc_net_spark.multimodal.audio import audio_fingerprints

    clips = synth.generate_clips(spark, 160, seed=42, with_audio=True)
    single = audio_fingerprints(clips, paired=False).localCheckpoint()
    paired = audio_fingerprints(clips, paired=True).localCheckpoint()
    assert (
        paired.select("word").distinct().count()
        > single.select("word").distinct().count()
    )
    max_single = single.groupBy("word").count().agg(F.max("count")).first()[0]
    max_paired = paired.groupBy("word").count().agg(F.max("count")).first()[0]
    assert max_paired <= max_single
