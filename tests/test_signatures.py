"""Fused signature stage parity: the ONE-scan kernel must be bit-identical
to every standalone operator it replaces (minhash/simhash/substring/exact),
plus salted-banding recall for SimHash and the capped lsh_topk plan."""

import pytest
from pyspark.sql import functions as F

from cc_net_spark.operators import exact_dedup as ed
from cc_net_spark.operators import minhash as mh
from cc_net_spark.operators import simhash as sh
from cc_net_spark.operators import substring as ss
from cc_net_spark.operators.signatures import fused_signatures
from cc_net_spark.sources import synth

N = 96


@pytest.fixture(scope="module")
def clips(spark):
    return synth.generate_clips(spark, N, seed=42, with_audio=False).select(
        "clip_id", "transcript"
    )


@pytest.fixture(scope="module")
def fused(spark, clips):
    return fused_signatures(
        clips, "transcript", "clip_id",
        shingle_size=5, num_perm=32, keep_shingles=True,
        substring_length=30, winnow_window=21,
    ).cache()


def test_minhash_parity(spark, clips, fused):
    ref = mh.shingle_signatures(
        clips, "transcript", "clip_id", shingle_size=5, num_perm=32
    )
    got = {r["clip_id"]: (r["n_shingles"], r["sig"], sorted(r["shingles"]))
           for r in fused.collect()}
    for r in ref.collect():
        n, sig, shg = got[r["clip_id"]]
        assert n == r["n_shingles"]
        assert sig == r["sig"]
        assert shg == sorted(r["shingles"])


def test_simhash_parity(spark, clips, fused):
    ref = {r["clip_id"]: r["simhash"]
           for r in sh.simhash_signatures(clips, "transcript", "clip_id").collect()}
    for r in fused.select("clip_id", "simhash").collect():
        assert r["simhash"] == ref[r["clip_id"]]


def test_simhash_ngram_parity_and_decorrelation(spark, clips):
    """Trigram-feature SimHash (the pipeline default): fused ==
    standalone bit-for-bit, exact duplicates stay at Hamming 0, and the
    trigram basis genuinely differs from the unigram one (the point of
    the feature change)."""
    from cc_net_spark.operators.signatures import fused_signatures

    ref = {
        r["clip_id"]: r["simhash"]
        for r in sh.simhash_signatures(
            clips, "transcript", "clip_id", ngram=3
        ).collect()
    }
    fused3 = fused_signatures(
        clips, "transcript", "clip_id", simhash_ngram=3
    )
    uni = {}
    for r in fused3.select("clip_id", "simhash").collect():
        assert r["simhash"] == ref[r["clip_id"]]
    uni = {
        r["clip_id"]: r["simhash"]
        for r in sh.simhash_signatures(clips, "transcript", "clip_id").collect()
    }
    assert any(ref[k] != uni[k] for k in ref if uni[k] != 0)


def test_grams_parity(spark, clips, fused):
    ref: dict[str, set] = {}
    rows = ss.doc_window_grams(
        clips, "transcript", "clip_id", length=30, winnow_window=21
    ).collect()
    for r in rows:
        ref.setdefault(r["clip_id"], set()).add(r["gram"])
    for r in fused.select("clip_id", "grams").collect():
        assert set(r["grams"]) == ref.get(r["clip_id"], set())


def test_tkey_parity(spark, clips, fused):
    ref = {
        r["clip_id"]: r["k"]
        for r in clips.select(
            "clip_id", ed.dedup_hash_udf(F.col("transcript")).alias("k")
        ).collect()
    }
    for r in fused.select("clip_id", "tkey").collect():
        assert r["tkey"] == ref[r["clip_id"]]


def test_simhash_salted_hot_band_full_recall(spark):
    """A planted hot band bucket (many identical simhashes, far above the
    cap) must still yield EVERY true pair under the default salted path —
    the round-2 cap would have dropped the whole bucket (recall cliff)."""
    n = 64
    rows = [(str(i), 0x0F0F) for i in range(n)]  # identical sig -> one hot bucket
    sim = spark.createDataFrame(rows, "doc_id string, simhash long")
    pairs = sh.simhash_candidate_pairs(sim, "doc_id", max_hamming=4, bucket_cap=10)
    assert pairs.count() == n * (n - 1) // 2
    # capped path (salt_hot=False) drops them all — the contrast this fixes
    capped = sh.simhash_candidate_pairs(
        sim, "doc_id", max_hamming=4, bucket_cap=10, salt_hot=False
    )
    assert capped.count() == 0


def test_lsh_topk_salted_matches_bruteforce_recall(spark):
    """lsh_topk after the salted rewrite: candidates are identical to the
    raw bucket self-join, so results equal the round-2 output (here:
    checked against a brute-force rerank restricted to co-bucket pairs
    via a tiny corpus where LSH recall is total for scaled duplicates)."""
    import numpy as np

    from cc_net_spark.operators import ann

    rng = np.random.default_rng(3)
    base = rng.normal(size=(20, 8)).astype("float32")
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    # scaled copies share every band with their originals
    rows += [(100 + i, [float(x) * 0.5 for x in base[i]]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = ann.lsh_topk(emb, dim=8, k=1, n_bits=16, bands=4, hot_threshold=5)
    top1 = {r["query_id"]: (r["neighbor_id"], r["cosine"]) for r in got.collect()}
    for i in range(20):
        assert top1[i][0] == 100 + i and top1[i][1] == 1.0
        assert top1[100 + i][0] == i
