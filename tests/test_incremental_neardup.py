"""Incremental near-dup: arriving shards probe persisted LSH state —
history text is never re-read, writes are ∝ batch, replay is idempotent."""

import json

from pyspark.sql import functions as F

from cc_net_spark.streaming.incremental_neardup import (
    IncrementalNearDup,
    run_incremental_near_dup,
)

# letter-only vocabulary: normalize_for_dedup maps every digit to '0',
# so digit-suffixed words (w00..w39) would all collapse to ONE token and
# make shingle sets degenerate — near-dup Jaccard would be meaningless
_L = "abcdefghijklmnopqrstuvwxyz"
WORDS = [f"w{_L[i // 26]}{_L[i % 26]}" for i in range(40)]
BASE = " ".join(WORDS)                     # 36 distinct 5-grams
OTHER = " ".join(f"x{_L[i // 26]}{_L[i % 26]}" for i in range(40))
THIRD = " ".join(f"y{_L[i // 26]}{_L[i % 26]}" for i in range(40))


def _batch(spark, rows):
    return spark.createDataFrame(rows, "clip_id string, transcript string")


def test_cross_batch_and_within_batch_near_dups(spark, tmp_path):
    nd = IncrementalNearDup(str(tmp_path / "state"), str(tmp_path / "out"))

    nd.process_batch(_batch(spark, [("a0", BASE), ("a1", OTHER)]), 0)
    flags0 = spark.read.parquet(str(tmp_path / "out" / "flags"))
    assert {r["is_near_dup"] for r in flags0.collect()} == {False}

    # batch 1: b0 repeats history's BASE (cross-batch dup); d0/d1 repeat
    # each other AND history's a1 (same OTHER text); c0 is fresh
    nd.process_batch(
        _batch(spark, [("b0", BASE), ("c0", THIRD), ("d0", OTHER), ("d1", OTHER)]), 1
    )
    flags = {
        r["clip_id"]: r["is_near_dup"]
        for r in spark.read.parquet(str(tmp_path / "out" / "flags"))
        .filter(F.col("_batch_id") == 1)
        .collect()
    }
    # keep-first: every batch-1 clip with an earlier twin is a dup —
    # d0's first occurrence is history's a1, so d0 is a dup too
    assert flags == {"b0": True, "c0": False, "d0": True, "d1": True}

    pairs = {
        (r["id_a"], r["id_b"], r["kind"])
        for r in spark.read.parquet(str(tmp_path / "out" / "pairs"))
        .filter(F.col("_batch_id") == 1)
        .collect()
    }
    assert ("b0", "a0", "history") in pairs
    assert ("d0", "d1", "within") in pairs
    # d0/d1 match history's a1 too (same OTHER text)
    assert ("d0", "a1", "history") in pairs and ("d1", "a1", "history") in pairs
    assert not any(k == "history" and b in {"b0", "c0", "d0", "d1"} for _, b, k in pairs)

    # state writes ∝ batch (append-only, partitioned by _batch_id)
    sigs = spark.read.parquet(str(tmp_path / "state" / "sigs"))
    per_batch = {
        r["_batch_id"]: r["n"]
        for r in sigs.groupBy("_batch_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_batch == {0: 2, 1: 4}


def test_replay_is_idempotent(spark, tmp_path):
    nd = IncrementalNearDup(str(tmp_path / "state"), str(tmp_path / "out"))
    b0 = _batch(spark, [("a0", BASE), ("a1", OTHER)])
    b1 = _batch(spark, [("b0", BASE), ("c0", THIRD)])
    nd.process_batch(b0, 0)
    nd.process_batch(b1, 1)

    def snapshot():
        pairs = spark.read.parquet(str(tmp_path / "out" / "pairs"))
        flags = spark.read.parquet(str(tmp_path / "out" / "flags"))
        return (
            sorted(map(tuple, pairs.drop("jaccard_est").collect())),
            sorted(map(tuple, flags.collect())),
        )

    first = snapshot()
    # at-least-once replay of BOTH batches: history filter + dynamic
    # partition overwrite keep outputs and state byte-stable
    nd.process_batch(b0, 0)
    nd.process_batch(b1, 1)
    assert snapshot() == first
    assert spark.read.parquet(str(tmp_path / "state" / "sigs")).count() == 4
    assert (
        spark.read.parquet(str(tmp_path / "state" / "bands")).count() == 4 * 32
    )


def test_streaming_wrapper_resumes_from_checkpoint(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    (inp / "s0.json").write_text(
        json.dumps({"clip_id": "a0", "transcript": BASE})
        + "\n"
        + json.dumps({"clip_id": "a1", "transcript": OTHER})
    )
    args = (
        spark,
        str(inp),
        "clip_id string, transcript string",
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    run_incremental_near_dup(*args)
    (inp / "s1.json").write_text(json.dumps({"clip_id": "b0", "transcript": BASE}))
    run_incremental_near_dup(*args)

    flags = {
        r["clip_id"]: r["is_near_dup"]
        for r in spark.read.parquet(str(tmp_path / "out" / "flags")).collect()
    }
    assert flags == {"a0": False, "a1": False, "b0": True}
    # checkpoint means s0 was NOT reprocessed on the second run
    sigs = spark.read.parquet(str(tmp_path / "state" / "sigs"))
    assert sigs.count() == 3


def test_uri_state_paths_not_mangled():
    """s3a/hdfs state paths must survive path joining (pathlib would
    collapse 's3a://b' to 's3a:/b')."""
    nd = IncrementalNearDup("s3a://bucket/state", "hdfs://nn/out")
    assert nd.sigs_path == "s3a://bucket/state/sigs"
    assert nd.bands_path == "s3a://bucket/state/bands"


def test_empty_first_batch_does_not_wedge_the_stream(spark, tmp_path):
    """A 0-row first micro-batch (empty shard file) must not create an
    empty state dir that crashes every later batch on schema inference."""
    nd = IncrementalNearDup(str(tmp_path / "state"), str(tmp_path / "out"))
    empty = _batch(spark, [("x", BASE)]).filter("clip_id = 'nope'")
    nd.process_batch(empty, 0)
    nd.process_batch(_batch(spark, [("a0", BASE), ("a1", BASE)]), 1)
    flags = {
        r["clip_id"]: r["is_near_dup"]
        for r in spark.read.parquet(str(tmp_path / "out" / "flags")).collect()
    }
    assert flags == {"a0": False, "a1": True}


def test_hot_batch_bucket_is_capped_and_metered(spark, tmp_path):
    """A flood of identical docs in ONE batch: within pairs are dropped by
    the cap AND the history probe excludes the hot batch-side keys — but
    nothing is silent: the per-batch metrics partition records both."""
    nd = IncrementalNearDup(
        str(tmp_path / "state"), str(tmp_path / "out"), bucket_cap=10
    )
    nd.process_batch(_batch(spark, [("h0", BASE)]), 0)
    flood = _batch(spark, [(f"f{i:03d}", BASE) for i in range(25)])
    nd.process_batch(flood, 1)

    m = (
        spark.read.parquet(str(tmp_path / "out" / "metrics"))
        .filter((F.col("_batch_id") == 1) & (F.col("family") == "minhash"))
        .first()
    )
    # the same hot buckets are dropped from the self-join AND excluded
    # from the history probe (same cap, same table) — one counter set
    assert m["n_hot_buckets_dropped"] >= 1
    assert m["n_hot_rows_dropped"] >= 25
    # the hot bucket produced no pairs (order-dependent recall loss is
    # the documented cap semantics — and it is RECORDED, not silent)
    pairs = spark.read.parquet(str(tmp_path / "out" / "pairs"))
    assert pairs.filter(F.col("_batch_id") == 1).count() == 0


def test_compact_state_preserves_probe_results(spark, tmp_path):
    """compact_state rewrites N batch partitions into one (small-file
    maintenance, replay-leftover dedupe); a probe against the compacted
    state yields byte-identical pairs/flags."""
    from cc_net_spark.streaming.incremental_neardup import compact_state

    nd = IncrementalNearDup(str(tmp_path / "state"), str(tmp_path / "out"))
    nd.process_batch(_batch(spark, [("a0", BASE), ("a1", OTHER)]), 0)
    nd.process_batch(_batch(spark, [("b0", THIRD)]), 1)
    nd.process_batch(_batch(spark, [("b0", THIRD)]), 1)  # replay leftover

    # the stream checkpoint has committed batches 0 and 1 -> upto_batch=2
    compact_state(
        spark, str(tmp_path / "state"), str(tmp_path / "compacted"), upto_batch=2
    )
    sigs = spark.read.parquet(str(tmp_path / "compacted" / "sigs"))
    assert sigs.count() == 3  # one row per id, replay deduped
    # one partition, rebadged to upto_batch-1 so any later probe sees it
    assert [r["_batch_id"] for r in sigs.select("_batch_id").distinct().collect()] == [1]

    def probe(state_dir, out_dir):
        h = IncrementalNearDup(state_dir, out_dir)
        h.process_batch(_batch(spark, [("c0", BASE), ("c1", "fresh " + THIRD)]), 5)
        pairs = spark.read.parquet(f"{out_dir}/pairs")
        flags = spark.read.parquet(f"{out_dir}/flags")
        return (
            sorted(map(tuple, pairs.collect())),
            sorted(map(tuple, flags.collect())),
        )

    got = probe(str(tmp_path / "compacted"), str(tmp_path / "out_c"))
    exp = probe(str(tmp_path / "state"), str(tmp_path / "out_u"))
    assert got == exp
    # the probe actually found the cross-batch dup through compacted state
    assert any(r[0] == "c0" and r[1] is True for r in got[1])

    # partial compaction: batches >= upto_batch pass through with their
    # own partition values (they may still replay). The uncompacted
    # probe above appended batch 5 to the original state, so with
    # upto_batch=1 only batch 0 is rebadged; 1 and 5 survive verbatim.
    compact_state(
        spark, str(tmp_path / "state"), str(tmp_path / "c2"), upto_batch=1
    )
    s2 = spark.read.parquet(str(tmp_path / "c2" / "sigs"))
    assert {
        r["_batch_id"] for r in s2.select("_batch_id").distinct().collect()
    } == {0, 1, 5}


def test_incremental_union_equals_batch_mode(spark, tmp_path):
    """Sharding a corpus into two arriving batches finds EXACTLY the pair
    set batch-mode MinHash-LSH finds on the whole corpus at the same
    config (caps inactive at this size): incrementality costs no recall."""
    from cc_net_spark.operators.minhash import (
        estimated_jaccard,
        minhash_candidate_pairs,
        shingle_signatures,
    )
    from cc_net_spark.sources import synth

    clips = synth.generate_clips(spark, 48, seed=7, with_audio=False)
    even = F.expr("CAST(substring(clip_id, 6) AS INT) % 2 = 0")

    nd = IncrementalNearDup(str(tmp_path / "state"), str(tmp_path / "out"))
    nd.process_batch(clips.filter(even), 0)
    nd.process_batch(clips.filter(~even), 1)
    got = {
        frozenset((r["id_a"], r["id_b"]))
        for r in spark.read.parquet(str(tmp_path / "out" / "pairs")).collect()
    }

    sig = shingle_signatures(
        clips, "transcript", "clip_id", keep_shingles=False
    ).localCheckpoint()
    cand = minhash_candidate_pairs(sig, "clip_id")
    exp = {
        frozenset((r["id_a"], r["id_b"]))
        for r in estimated_jaccard(cand, sig, "clip_id", threshold=0.5).collect()
    }
    assert got == exp
    assert len(exp) > 0  # the synth corpus plants real near-dups


def test_multi_family_incremental(spark, tmp_path):
    """families=(minhash, simhash, exact): one fused scan per batch feeds
    all three pair families against their persisted state; each family
    flags the cross-batch twin it is built to catch."""
    nd = IncrementalNearDup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        families=("minhash", "simhash", "exact"),
    )
    # 1-of-40 token change: exact shingle J = 31/41 = 0.756 >= 0.5, and
    # simhash Hamming = 1 <= 4 (verified for this exact vocabulary)
    near = BASE.replace("wad", "zqwad")
    nd.process_batch(_batch(spark, [("a0", BASE), ("a1", THIRD)]), 0)
    nd.process_batch(
        _batch(spark, [("b0", BASE), ("b1", near), ("b2", OTHER)]), 1
    )

    pairs = spark.read.parquet(str(tmp_path / "out" / "pairs"))
    kinds = {
        (r["id_a"], r["id_b"], r["kind"])
        for r in pairs.filter(F.col("_batch_id") == 1).collect()
    }
    # b0 == a0 exactly: caught by ALL THREE families
    assert ("b0", "a0", "history") in kinds
    assert ("b0", "a0", "simhash_history") in kinds
    assert ("b0", "a0", "exact_history") in kinds
    # b1 is a 1-token edit of a0: near-dup families catch it, exact must NOT
    assert ("b1", "a0", "history") in kinds
    assert ("b1", "a0", "simhash_history") in kinds
    assert ("b1", "a0", "exact_history") not in kinds
    # b0/b1 pair within the batch too
    assert ("b0", "b1", "within") in kinds
    assert not any(k.startswith("exact") and a == "b2" for a, _, k in kinds)

    flags = {
        r["clip_id"]: r["is_near_dup"]
        for r in spark.read.parquet(str(tmp_path / "out" / "flags"))
        .filter(F.col("_batch_id") == 1)
        .collect()
    }
    assert flags == {"b0": True, "b1": True, "b2": False}

    # per-family metrics rows, and simbands state persisted
    fams = {
        r["family"]
        for r in spark.read.parquet(str(tmp_path / "out" / "metrics")).collect()
    }
    assert fams == {"minhash", "simhash", "exact"}
    assert spark.read.parquet(str(tmp_path / "state" / "simbands")).count() > 0

    # replay stays idempotent across all families (repr-keyed sort:
    # nullable jaccard_est/hamming make raw tuples unorderable)
    before = sorted(map(tuple, pairs.collect()), key=repr)
    nd.process_batch(
        _batch(spark, [("b0", BASE), ("b1", near), ("b2", OTHER)]), 1
    )
    after = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "out" / "pairs")).collect()),
        key=repr,
    )
    assert after == before


def test_exact_family_flood_is_cap_free(spark, tmp_path):
    """A flood of identical texts past bucket_cap must still be FULLY
    flagged by the exact family — key equality needs no pairwise
    enumeration (each dup pairs with its keep-first representative), so
    the LSH cap rationale does not apply to exact dedup itself."""
    nd = IncrementalNearDup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        bucket_cap=10, families=("exact",),
    )
    nd.process_batch(_batch(spark, [("h0", BASE)]), 0)
    nd.process_batch(_batch(spark, [(f"f{i:03d}", BASE) for i in range(25)]), 1)

    flags = {
        r["clip_id"]: r["is_near_dup"]
        for r in spark.read.parquet(str(tmp_path / "out" / "flags"))
        .filter(F.col("_batch_id") == 1)
        .collect()
    }
    assert all(flags.values()) and len(flags) == 25  # every copy flagged
    pairs = spark.read.parquet(str(tmp_path / "out" / "pairs")).filter(
        F.col("_batch_id") == 1
    )
    # 25 history pairs (each -> h0) + 24 within pairs (each -> f000)
    kinds = {r["kind"]: 0 for r in pairs.select("kind").distinct().collect()}
    for r in pairs.collect():
        kinds[r["kind"]] += 1
    assert kinds == {"exact_history": 25, "exact_within": 24}
    assert pairs.filter(
        (F.col("kind") == "exact_history") & (F.col("id_b") != "h0")
    ).count() == 0


def test_redelivered_id_and_duplicate_rows(spark, tmp_path):
    """Edge regressions from review: (a) a re-delivered id that IS its
    key's history representative must still be flagged (it is not first);
    (b) a shard repeating a clip_id must not fan out duplicate pair/flag
    rows — the batch is deduped by id up front."""
    nd = IncrementalNearDup(
        str(tmp_path / "state"), str(tmp_path / "out"), families=("exact",)
    )
    # a1 < z9 lexically: a1 is the history rep for BASE's key
    nd.process_batch(_batch(spark, [("a1", BASE), ("z9", BASE)]), 0)
    # batch 1 re-delivers a1 (twice, simulating a duplicated shard row)
    nd.process_batch(_batch(spark, [("a1", BASE), ("a1", BASE)]), 1)

    flags = spark.read.parquet(str(tmp_path / "out" / "flags")).filter(
        F.col("_batch_id") == 1
    )
    assert [(r["clip_id"], r["is_near_dup"]) for r in flags.collect()] == [
        ("a1", True)
    ]  # exactly ONE row, flagged despite being its key's history rep

    pairs = spark.read.parquet(str(tmp_path / "out" / "pairs")).filter(
        F.col("_batch_id") == 1
    )
    rows = [tuple(r) for r in pairs.select("id_a", "id_b", "kind").collect()]
    assert len(rows) == len(set(rows))  # no duplicate pair rows


def test_audio_family_incremental(spark, tmp_path):
    """The PAYLOAD family: audio fingerprint words probe persisted word
    state; verification is word-set Jaccard against state (history bytes
    never re-decoded). On the planted synth corpus the within+history
    pairs union exactly the expected intra-cluster pairs."""
    from cc_net_spark.sources import synth

    n = 32
    clips = synth.generate_clips(spark, n, seed=42, with_audio=True)
    even = F.expr("CAST(substring(clip_id, 6) AS INT) % 2 = 0")
    nd = IncrementalNearDup(
        str(tmp_path / "state"), str(tmp_path / "out"), families=("audio",)
    )
    nd.process_batch(clips.filter(even), 0)
    nd.process_batch(clips.filter(~even), 1)

    pairs = spark.read.parquet(str(tmp_path / "out" / "pairs"))
    got = {
        frozenset((r["id_a"], r["id_b"]))
        for r in pairs.filter(F.col("kind").like("audio%")).collect()
    }
    exp = {
        frozenset((r["clip_id_a"], r["clip_id_b"]))
        for r in synth.expected_dup_pairs(spark, n).collect()
    }
    assert got == exp and len(exp) > 0
    # state persisted for future batches; per-family metrics recorded
    assert spark.read.parquet(str(tmp_path / "state" / "audiosigs")).count() > 0
    fams = {
        r["family"]
        for r in spark.read.parquet(str(tmp_path / "out" / "metrics")).collect()
    }
    assert fams == {"audio"}


def test_audio_only_stream_without_transcripts(spark, tmp_path):
    """families=('audio',) on a payload-only schema (no transcript
    column): the text scan is skipped entirely; a poison record (stub
    codec the decoder cannot handle) is counted in metrics, not raised —
    a foreachBatch crash would replay into itself forever."""
    from cc_net_spark.multimodal.audio import wav_encode_pcm16
    import numpy as np

    def clip(cid, freq, phase=0.0):
        t = np.arange(4096) / 16000.0
        pcm = 0.5 * np.sin(2 * np.pi * freq * t + phase)
        return (cid, "pcm_s16le", wav_encode_pcm16(pcm.astype(np.float32), 16000))

    schema = "clip_id string, codec string, bytes binary"
    nd = IncrementalNearDup(
        str(tmp_path / "state"), str(tmp_path / "out"), families=("audio",)
    )
    nd.process_batch(spark.createDataFrame([clip("a0", 440.0)], schema), 0)
    b1 = spark.createDataFrame(
        [
            clip("b0", 440.0, phase=0.001),   # same tone: audio dup of a0
            clip("b1", 1100.0),               # different tone
            ("b2", "opus", b"\x00\x01"),      # poison: stub codec
        ],
        schema,
    )
    nd.process_batch(b1, 1)

    flags = {
        r["clip_id"]: r["is_near_dup"]
        for r in spark.read.parquet(str(tmp_path / "out" / "flags"))
        .filter(F.col("_batch_id") == 1)
        .collect()
    }
    assert flags["b0"] is True and flags["b1"] is False and flags["b2"] is False
    m = {
        r["family"]: r["n_buckets"]
        for r in spark.read.parquet(str(tmp_path / "out" / "metrics"))
        .filter(F.col("_batch_id") == 1)
        .collect()
    }
    assert m.get("audio_decode_failures") == 1
    # no text state was written (no transcript column existed)
    import os
    assert not os.path.exists(str(tmp_path / "state" / "sigs"))


def test_history_probe_prunes_state_buckets(spark, tmp_path, monkeypatch):
    """The round-4 scale contract: an arriving shard's history probe
    READS only the state buckets its keys hash into — partition pruning
    on the ``_kb`` hive level — never a full scan of persisted state.

    Evidence: (a) every ``_history`` call during the probe passes a
    bucket set strictly smaller than the buckets present on disk, and
    (b) the pruned read's physical plan carries both partition columns
    in PartitionFilters (Spark prunes the file index on those — no
    non-matching directory is ever listed into the scan)."""
    import io
    import os
    from contextlib import redirect_stdout

    nd = IncrementalNearDup(
        str(tmp_path / "state"), str(tmp_path / "out"), n_state_buckets=256
    )
    # 40 history docs with disjoint vocabularies: 40 x 32 band keys
    # spread across most of the 256 state buckets
    hist_rows = [
        (f"h{i:02d}", " ".join(f"{_L[i // 26]}{_L[i % 26]}{w}" for w in WORDS))
        for i in range(40)
    ]
    nd.process_batch(_batch(spark, hist_rows), 0)
    bands_dir = tmp_path / "state" / "bands" / "_batch_id=0"
    n_disk_buckets = len([d for d in os.listdir(bands_dir) if d.startswith("_kb=")])
    assert n_disk_buckets > 40  # history really is spread wide

    calls: list[tuple[str, tuple[int, ...]]] = []
    orig = IncrementalNearDup._history

    def spy(self, spark_, path, before, kbs, **kw):
        calls.append((path.rsplit("/", 1)[-1], tuple(kbs)))
        return orig(self, spark_, path, before, kbs, **kw)

    monkeypatch.setattr(IncrementalNearDup, "_history", spy)
    # the arriving shard: ONE doc repeating h07's text -> 32 band keys
    nd.process_batch(_batch(spark, [("z0", hist_rows[7][1])]), 1)

    assert calls, "probe made no history reads"
    for table, kbs in calls:
        # every read is pruned to a strict subset of on-disk buckets:
        # band keys of one doc -> <= 32 of 256; id-keyed reads -> 1
        assert 0 < len(kbs) <= 33, (table, len(kbs))
        assert len(kbs) < n_disk_buckets, (table, len(kbs), n_disk_buckets)
    # ... and the dup was still found through the pruned reads
    flags = {
        r["clip_id"]: r["is_near_dup"]
        for r in spark.read.parquet(str(tmp_path / "out" / "flags"))
        .filter(F.col("_batch_id") == 1)
        .collect()
    }
    assert flags == {"z0": True}

    # plan-level evidence: both hive levels appear as PartitionFilters
    monkeypatch.setattr(IncrementalNearDup, "_history", orig)
    pruned = nd._history(spark, nd.bands_path, 2, kbs=[0, 1, 2])
    buf = io.StringIO()
    with redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "_kb" in pf[0] and "_batch_id" in pf[0], plan


def test_mismatched_state_bucket_count_is_rejected(spark, tmp_path):
    """n_state_buckets is baked into the state layout; probing with a
    different value would silently miss matches — the meta table turns
    that into a loud construction-time error."""
    import pytest

    nd = IncrementalNearDup(
        str(tmp_path / "state"), str(tmp_path / "out"), n_state_buckets=64
    )
    nd.process_batch(_batch(spark, [("a0", BASE)]), 0)
    bad = IncrementalNearDup(
        str(tmp_path / "state"), str(tmp_path / "out2"), n_state_buckets=32
    )
    with pytest.raises(ValueError, match="n_state_buckets"):
        bad.process_batch(_batch(spark, [("b0", BASE)]), 1)


def test_audio_exact_verify_rejects_sketch_collision(spark, tmp_path):
    """The optional exact PCM-SNR follow-up stage: a planted sketch
    collision — a RESCALED different take (identical occupancy words,
    identical sign sketch, ~6 dB SNR) — passes the state-only verdict
    but is rejected by the bounded re-read stage; a true duplicate
    (same signal + noise floor) survives it. Rejections are metered."""
    import numpy as np

    from cc_net_spark.multimodal.audio import wav_encode_pcm16

    rng = np.random.default_rng(11)
    t = np.arange(16384) / 16000.0
    base = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    dup = (base + rng.uniform(-1e-4, 1e-4, len(base))).astype(np.float32)
    scaled = (0.5 * base).astype(np.float32)  # words+sketch collide, SNR ~6 dB

    schema = "clip_id string, codec string, bytes binary"

    def rows(items):
        return spark.createDataFrame(
            [(cid, "pcm_s16le", wav_encode_pcm16(p, 16000)) for cid, p in items],
            schema,
        )

    corpus = tmp_path / "corpus"
    rows([("a0", base)]).write.mode("overwrite").parquet(str(corpus))

    nd = IncrementalNearDup(
        str(tmp_path / "state"), str(tmp_path / "out"), families=("audio",),
        audio_exact_verify=True, clips_source=str(corpus),
    )
    nd.process_batch(rows([("a0", base)]), 0)
    nd.process_batch(rows([("b0", dup), ("b1", scaled)]), 1)

    flags = {
        r["clip_id"]: r["is_near_dup"]
        for r in spark.read.parquet(str(tmp_path / "out" / "flags"))
        .filter(F.col("_batch_id") == 1)
        .collect()
    }
    assert flags == {"b0": True, "b1": False}
    pairs = {
        (r["id_a"], r["id_b"], r["kind"])
        for r in spark.read.parquet(str(tmp_path / "out" / "pairs"))
        .filter(F.col("_batch_id") == 1)
        .collect()
    }
    assert ("b0", "a0", "audio_history") in pairs
    assert not any("b1" in (a, b) for a, b, _ in pairs)
    m = {
        r["family"]: r["n_buckets"]
        for r in spark.read.parquet(str(tmp_path / "out" / "metrics"))
        .filter(F.col("_batch_id") == 1)
        .collect()
    }
    assert m.get("audio_snr_rejected", 0) >= 2  # b1-a0 history + b0-b1 within

    # WITHOUT the stage the collision sails through — the stage is
    # load-bearing, not decorative
    nd2 = IncrementalNearDup(
        str(tmp_path / "state2"), str(tmp_path / "out2"), families=("audio",)
    )
    nd2.process_batch(rows([("a0", base)]), 0)
    nd2.process_batch(rows([("b0", dup), ("b1", scaled)]), 1)
    flags2 = {
        r["clip_id"]: r["is_near_dup"]
        for r in spark.read.parquet(str(tmp_path / "out2" / "flags"))
        .filter(F.col("_batch_id") == 1)
        .collect()
    }
    assert flags2 == {"b0": True, "b1": True}

    import pytest

    with pytest.raises(ValueError, match="clips_source"):
        IncrementalNearDup(
            str(tmp_path / "s3"), str(tmp_path / "o3"), families=("audio",),
            audio_exact_verify=True,
        )


def test_audio_snr_stage_missing_bytes_fail_open(spark, tmp_path):
    """A history pair whose clip bytes are absent from clips_source
    (corpus lag / compaction) is UNVERIFIABLE: the state verdict stands
    (fail open) and the count is metered as audio_snr_unverifiable —
    never a silent drop."""
    import numpy as np

    from cc_net_spark.multimodal.audio import wav_encode_pcm16

    t = np.arange(16384) / 16000.0
    base = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    schema = "clip_id string, codec string, bytes binary"

    def rows(items):
        return spark.createDataFrame(
            [(cid, "pcm_s16le", wav_encode_pcm16(p, 16000)) for cid, p in items],
            schema,
        )

    corpus = tmp_path / "corpus"  # corpus LACKS a0 (history clip)
    rows([("zz", base)]).write.mode("overwrite").parquet(str(corpus))

    nd = IncrementalNearDup(
        str(tmp_path / "state"), str(tmp_path / "out"), families=("audio",),
        audio_exact_verify=True, clips_source=str(corpus),
    )
    nd.process_batch(rows([("a0", base)]), 0)
    nd.process_batch(rows([("b0", base)]), 1)

    pairs = {
        (r["id_a"], r["id_b"], r["kind"])
        for r in spark.read.parquet(str(tmp_path / "out" / "pairs"))
        .filter(F.col("_batch_id") == 1)
        .collect()
    }
    assert ("b0", "a0", "audio_history") in pairs  # kept, not dropped
    m = {
        r["family"]: r["n_buckets"]
        for r in spark.read.parquet(str(tmp_path / "out" / "metrics"))
        .filter(F.col("_batch_id") == 1)
        .collect()
    }
    assert m.get("audio_snr_unverifiable") == 1


def test_maybe_compact_state_thresholds_and_swap(spark, tmp_path):
    """Operational compaction: below the batch threshold nothing
    happens; above it the state is compacted out-of-place and atomically
    swapped in — later probes read the compacted tree and find the same
    dups (n_state_buckets marker survives the swap)."""
    from cc_net_spark.streaming.incremental_neardup import (
        maybe_compact_state,
    )

    state = str(tmp_path / "state")
    nd = IncrementalNearDup(state, str(tmp_path / "out"))
    for b, (cid, txt) in enumerate(
        [("a0", BASE), ("a1", OTHER), ("a2", THIRD)]
    ):
        nd.process_batch(_batch(spark, [(cid, txt)]), b)

    assert not maybe_compact_state(
        spark, state, upto_batch=3, min_batches=5
    )  # below threshold: untouched
    assert maybe_compact_state(spark, state, upto_batch=3, min_batches=3)
    sigs = spark.read.parquet(f"{state}/sigs")
    assert sigs.count() == 3
    assert [r["_batch_id"] for r in sigs.select("_batch_id").distinct().collect()] == [2]
    import os
    assert not os.path.exists(state + "_compacting")
    assert not os.path.exists(state + "_precompact")

    # the SAME handler keeps working against the swapped state
    nd.process_batch(_batch(spark, [("b0", BASE)]), 5)
    flags = {
        r["clip_id"]: r["is_near_dup"]
        for r in spark.read.parquet(str(tmp_path / "out" / "flags"))
        .filter(F.col("_batch_id") == 5)
        .collect()
    }
    assert flags == {"b0": True}


def test_streaming_wrapper_auto_compacts(spark, tmp_path):
    """compact_min_batches on the streaming wrapper: after the
    AvailableNow trigger drains, the state is compacted when enough
    batch partitions accumulated."""
    import json as _json

    inp = tmp_path / "in"
    inp.mkdir()
    for i, txt in enumerate([BASE, OTHER, THIRD]):
        (inp / f"s{i}.json").write_text(
            _json.dumps({"clip_id": f"a{i}", "transcript": txt})
        )
    args = (
        spark, str(inp), "clip_id string, transcript string",
        str(tmp_path / "state"), str(tmp_path / "out"), str(tmp_path / "ckpt"),
    )
    # maxFilesPerTrigger=4 and 3 files -> ONE batch; run thrice with new
    # files to accumulate batches
    run_incremental_near_dup(*args, compact_min_batches=2)
    (inp / "s3.json").write_text(
        _json.dumps({"clip_id": "b0", "transcript": BASE})
    )
    run_incremental_near_dup(*args, compact_min_batches=2)
    sigs = spark.read.parquet(str(tmp_path / "state" / "sigs"))
    # two batches accumulated -> compacted into ONE partition
    assert sigs.select("_batch_id").distinct().count() == 1
    assert sigs.count() == 4
    flags = {
        r["clip_id"]: r["is_near_dup"]
        for r in spark.read.parquet(str(tmp_path / "out" / "flags")).collect()
    }
    assert flags == {"a0": False, "a1": False, "a2": False, "b0": True}


def test_swap_crash_recovery_restores_live_state(spark, tmp_path):
    """A compaction swap that crashes between its two renames leaves NO
    live state tree (original parked at _precompact, half-written tree
    at _compacting). A fresh handler must heal the swap before probing —
    otherwise it would silently restart dedup history from empty."""
    import shutil

    from cc_net_spark.streaming.incremental_neardup import recover_state_swap

    state = str(tmp_path / "state")
    nd = IncrementalNearDup(state, str(tmp_path / "out"))
    nd.process_batch(_batch(spark, [("a0", BASE)]), 0)
    nd.process_batch(_batch(spark, [("a1", OTHER)]), 1)

    # simulate the crash window: live tree renamed away, compacted tree
    # incomplete (just a fragment dir)
    shutil.move(state, state + "_precompact")
    (tmp_path / "state_compacting" / "sigs").mkdir(parents=True)

    healed = recover_state_swap(spark, state)
    assert healed
    import os

    assert os.path.exists(f"{state}/sigs")
    assert not os.path.exists(state + "_compacting")
    assert not os.path.exists(state + "_precompact")

    # a NEW handler (fresh lifetime) heals implicitly and still sees the
    # restored history: b0 matches a0 across the recovered state
    shutil.move(state, state + "_precompact")
    nd2 = IncrementalNearDup(state, str(tmp_path / "out"))
    nd2.process_batch(_batch(spark, [("b0", BASE)]), 2)
    flags = {
        r["clip_id"]: r["is_near_dup"]
        for r in spark.read.parquet(str(tmp_path / "out" / "flags"))
        .filter(F.col("_batch_id") == 2)
        .collect()
    }
    assert flags == {"b0": True}

    # crash AFTER the second rename (live tree is the complete compacted
    # one, _precompact is a leftover): recovery just drops the leftover
    shutil.copytree(state, state + "_precompact")
    assert recover_state_swap(spark, state)
    assert os.path.exists(f"{state}/sigs")
    assert not os.path.exists(state + "_precompact")
    assert not recover_state_swap(spark, state)  # idempotent no-op


def test_embedding_family_incremental(spark, tmp_path):
    """The vector modality: arriving shards probe persisted hyperplane-
    LSH band state; verification is exact cosine against vectors stored
    IN state (history embeddings never re-read). A 0.5-scaled copy is a
    structural near-dup (all sign bits identical, cosine 1.0); an
    orthogonal vector never pairs."""
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.normal(size=16)
    ortho = np.zeros(16)
    ortho[0] = 1.0
    base -= base @ ortho * ortho  # exactly orthogonal to `ortho`

    def rows(items):
        return spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in items],
            "clip_id long, embedding array<float>",
        )

    nd = IncrementalNearDup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        families=("embedding",), emb_dim=16,
    )
    nd.process_batch(rows([("10", base), ("11", ortho)]), 0)
    # batch 1: a scaled copy of base (history match), a scaled copy of
    # itself under a larger id (within match), and an unrelated vector
    nd.process_batch(
        rows([("20", 0.5 * base), ("21", 0.25 * base),
              ("22", rng.normal(size=16))]),
        1,
    )
    pairs = {
        (r["id_a"], r["id_b"], r["kind"], r["jaccard_est"])
        for r in spark.read.parquet(str(tmp_path / "out" / "pairs")).collect()
    }
    assert ("20", "10", "embedding_history", 1.0) in pairs
    assert ("21", "10", "embedding_history", 1.0) in pairs
    assert ("20", "21", "embedding_within", 1.0) in pairs
    assert all(k in ("embedding_within", "embedding_history") for _, _, k, _ in pairs)
    assert not any("22" in (a, b) or "11" in (a, b) for a, b, _, _ in pairs)

    flags = {
        r["clip_id"]: r["is_near_dup"]
        for r in spark.read.parquet(str(tmp_path / "out" / "flags"))
        .filter(F.col("_batch_id") == 1)
        .collect()
    }
    assert flags == {"20": True, "21": True, "22": False}

    # replay of batch 1 is idempotent (state overwrite scoped to the batch)
    nd2 = IncrementalNearDup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        families=("embedding",), emb_dim=16,
    )
    nd2.process_batch(
        rows([("20", 0.5 * base), ("21", 0.25 * base),
              ("22", rng.normal(size=16))]),
        1,
    )
    again = {
        (r["id_a"], r["id_b"], r["kind"], r["jaccard_est"])
        for r in spark.read.parquet(str(tmp_path / "out" / "pairs")).collect()
    }
    assert again == pairs

    # emb_dim is mandatory for the family
    import pytest

    with pytest.raises(ValueError, match="emb_dim"):
        IncrementalNearDup(
            str(tmp_path / "s2"), str(tmp_path / "o2"), families=("embedding",)
        )


def test_embedding_poison_vectors_are_metered_not_raised(spark):
    """A null / wrong-length / null-element vector must not crash the
    batch (a foreachBatch crash replays into itself forever): such rows
    are dropped from the family, metered, and still flagged non-dup."""
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        nd = IncrementalNearDup(
            f"{td}/state", f"{td}/out", families=("embedding",), emb_dim=4
        )
        rows = spark.createDataFrame(
            [
                (1, [1.0, 2.0, 3.0, 4.0]),
                (2, None),                      # null vector
                (3, [1.0, 2.0]),                # wrong length
                (4, [1.0, None, 3.0, 4.0]),     # null element
                (5, [2.0, 4.0, 6.0, 8.0]),      # scaled copy of id 1
            ],
            "clip_id long, embedding array<float>",
        )
        nd.process_batch(rows, 0)
        flags = {
            r["clip_id"]: r["is_near_dup"]
            for r in spark.read.parquet(f"{td}/out/flags").collect()
        }
        # every row gets a flag; poison rows are non-dup; the valid
        # scaled copy still pairs with its original
        assert flags == {"1": False, "2": False, "3": False, "4": False,
                         "5": True}
        metrics = {
            r["family"]: r["n_buckets"]
            for r in spark.read.parquet(f"{td}/out/metrics").collect()
        }
        assert metrics["embedding_invalid_vectors"] == 3


def test_swap_refuses_non_atomic_rename_schemes():
    """The compaction swap protocol is only sound under atomic renames;
    object-store schemes must be refused (a mid-rename crash there
    leaves both trees partial — unrecoverable locally)."""
    from cc_net_spark.streaming.incremental_neardup import _rename_is_atomic

    for ok in (None, "file", "hdfs", "viewfs", "abfss"):
        assert _rename_is_atomic(ok), ok
    for bad in ("s3a", "s3", "gs", "wasb", "oss", "cos"):
        assert not _rename_is_atomic(bad), bad


def test_embedding_state_compacts_and_composes_with_text(spark, tmp_path):
    """The embedding family composes with a text family in one handler
    (separate state tables, shared flag surface), and compaction
    preserves the embedding tables — a post-compaction shard still
    matches pre-compaction vector history."""
    import numpy as np

    from cc_net_spark.streaming.incremental_neardup import maybe_compact_state

    rng = np.random.default_rng(7)
    v0, v1, v2 = rng.normal(size=16), rng.normal(size=16), rng.normal(size=16)

    def rows(items):
        return spark.createDataFrame(
            [(i, t, [float(x) for x in v]) for i, t, v in items],
            "clip_id string, transcript string, embedding array<float>",
        )

    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    nd = IncrementalNearDup(
        state, out, families=("minhash", "embedding"), emb_dim=16
    )
    nd.process_batch(rows([("a0", BASE, v0)]), 0)
    nd.process_batch(rows([("a1", OTHER, v1)]), 1)
    nd.process_batch(rows([("a2", THIRD, v2)]), 2)
    assert maybe_compact_state(spark, state, upto_batch=3, min_batches=3)
    # compacted embedding tables keep their bucketed layout
    embsigs = spark.read.parquet(f"{state}/embsigs")
    assert embsigs.count() == 3
    assert "_kb" in embsigs.columns

    # b0: near-dup TEXT of a0 with an unrelated vector; b1: unrelated
    # text with a scaled copy of a1's vector -> one match per family,
    # both against COMPACTED history
    nd.process_batch(
        rows([("b0", BASE, rng.normal(size=16)),
              ("b1", " ".join(f"z{w}" for w in BASE.split()), 0.5 * v1)]),
        5,
    )
    pairs = {
        (r["id_a"], r["id_b"], r["kind"])
        for r in spark.read.parquet(f"{out}/pairs")
        .filter(F.col("_batch_id") == 5)
        .collect()
    }
    assert ("b0", "a0", "history") in pairs
    assert ("b1", "a1", "embedding_history") in pairs
    flags = {
        r["clip_id"]: r["is_near_dup"]
        for r in spark.read.parquet(f"{out}/flags")
        .filter(F.col("_batch_id") == 5)
        .collect()
    }
    assert flags == {"b0": True, "b1": True}


def test_pointer_state_compaction_flips_current(spark, tmp_path):
    """The object-store-safe compaction path: the live tree is resolved
    through <root>/CURRENT; compaction writes the next version and
    commits by overwriting the one-line pointer (no directory renames).
    Orphan trees from crashed attempts are reclaimed, and post-flip
    probes still match pre-compaction history."""
    from cc_net_spark.streaming.incremental_neardup import (
        compact_state_pointer,
        init_state_pointer,
    )

    root, out = str(tmp_path / "root"), str(tmp_path / "out")
    live = init_state_pointer(spark, root)
    assert live.endswith("/v0")
    assert init_state_pointer(spark, root) == live  # idempotent resolve

    nd = IncrementalNearDup(live, out)
    for b, (cid, txt) in enumerate([("a0", BASE), ("a1", OTHER), ("a2", THIRD)]):
        nd.process_batch(_batch(spark, [(cid, txt)]), b)

    # below threshold: nothing happens
    assert not compact_state_pointer(spark, root, upto_batch=3, min_batches=5)
    # a crashed previous attempt left an orphan version tree
    (tmp_path / "root" / "v1" / "junk").mkdir(parents=True)
    assert compact_state_pointer(spark, root, upto_batch=3, min_batches=3)

    import os

    assert (tmp_path / "root" / "CURRENT").read_text() == "v1"
    assert not os.path.exists(str(tmp_path / "root" / "v0"))
    new_live = init_state_pointer(spark, root)
    sigs = spark.read.parquet(f"{new_live}/sigs")
    assert sigs.count() == 3
    assert [r["_batch_id"] for r in sigs.select("_batch_id").distinct().collect()] == [2]

    # a fresh handler over the flipped tree still finds compacted history
    nd2 = IncrementalNearDup(new_live, out)
    nd2.process_batch(_batch(spark, [("b0", BASE)]), 5)
    flags = {
        r["clip_id"]: r["is_near_dup"]
        for r in spark.read.parquet(f"{out}/flags")
        .filter(F.col("_batch_id") == 5)
        .collect()
    }
    assert flags == {"b0": True}


def test_streaming_wrapper_pointer_state(spark, tmp_path):
    """pointer_state=True on the streaming wrapper: the live tree
    resolves through <root>/CURRENT, auto-compaction flips the pointer,
    and a later invocation resumes against the flipped tree."""
    import json as _json

    inp = tmp_path / "in"
    inp.mkdir()
    for i, txt in enumerate([BASE, OTHER, THIRD]):
        (inp / f"s{i}.json").write_text(
            _json.dumps({"clip_id": f"a{i}", "transcript": txt})
        )
    root = str(tmp_path / "root")
    args = (
        spark, str(inp), "clip_id string, transcript string",
        root, str(tmp_path / "out"), str(tmp_path / "ckpt"),
    )
    run_incremental_near_dup(*args, compact_min_batches=2, pointer_state=True)
    (inp / "s3.json").write_text(
        _json.dumps({"clip_id": "b0", "transcript": BASE})
    )
    run_incremental_near_dup(*args, compact_min_batches=2, pointer_state=True)
    cur = (tmp_path / "root" / "CURRENT").read_text()
    assert cur != "v0"  # at least one flip happened
    sigs = spark.read.parquet(f"{root}/{cur}/sigs")
    assert sigs.select("_batch_id").distinct().count() == 1
    assert sigs.count() == 4
    flags = {
        r["clip_id"]: r["is_near_dup"]
        for r in spark.read.parquet(str(tmp_path / "out" / "flags")).collect()
    }
    assert flags == {"a0": False, "a1": False, "a2": False, "b0": True}


def test_pointer_mismatches_fail_loudly(spark, tmp_path):
    """Layout mismatches must never silently resolve to an empty tree:
    a plain state tree refuses pointer-ization, a pointer root refuses
    plain handler use and direct compact_state, a corrupt CURRENT
    refuses to resolve, and a crashed pointer commit rolls forward."""
    import pytest

    from cc_net_spark.streaming.incremental_neardup import (
        compact_state,
        init_state_pointer,
    )

    # plain tree -> pointer-izing would orphan history
    plain = str(tmp_path / "plain")
    nd = IncrementalNearDup(plain, str(tmp_path / "out"))
    nd.process_batch(_batch(spark, [("a0", BASE)]), 0)
    with pytest.raises(ValueError, match="plain"):
        init_state_pointer(spark, plain)

    # pointer root used as a plain state tree -> loud error
    root = str(tmp_path / "root")
    live = init_state_pointer(spark, root)
    nd2 = IncrementalNearDup(root, str(tmp_path / "out2"))
    with pytest.raises(ValueError, match="pointer-managed"):
        nd2.process_batch(_batch(spark, [("b0", BASE)]), 0)
    # ... and direct compact_state on the root is refused too
    with pytest.raises(ValueError, match="pointer-managed"):
        compact_state(spark, root, str(tmp_path / "x"), upto_batch=1)
    # the resolved tree works
    nd3 = IncrementalNearDup(live, str(tmp_path / "out2"))
    nd3.process_batch(_batch(spark, [("b0", BASE)]), 0)

    # corrupt pointer -> refuse (never resolve to an empty tree)
    (tmp_path / "root" / "CURRENT").write_text("")
    with pytest.raises(ValueError, match="corrupt|expected"):
        init_state_pointer(spark, root)
    (tmp_path / "root" / "CURRENT").write_text("v0")

    # crashed commit window: CURRENT deleted, CURRENT.tmp written ->
    # next resolve rolls the commit forward
    (tmp_path / "root" / "CURRENT.tmp").write_text("v7")
    (tmp_path / "root" / "CURRENT").unlink()
    (tmp_path / "root" / "v7").mkdir()
    assert init_state_pointer(spark, root).endswith("/v7")
    assert (tmp_path / "root" / "CURRENT").read_text() == "v7"


def test_pointer_orphan_reclaimed_without_compaction(spark, tmp_path):
    """A crash after the pointer flip but before the old-tree delete
    must not leak a full state copy until the NEXT compaction: the
    orphan sweep runs even when the size guard then returns False."""
    from cc_net_spark.streaming.incremental_neardup import (
        compact_state_pointer,
        init_state_pointer,
    )

    root = str(tmp_path / "root")
    live = init_state_pointer(spark, root)
    nd = IncrementalNearDup(live, str(tmp_path / "out"))
    nd.process_batch(_batch(spark, [("a0", BASE)]), 0)
    # simulate: flip happened (CURRENT=v1 with state moved), old v0 left
    import shutil

    from cc_net_spark.sources.hadoop_fs import write_small_text

    shutil.copytree(live, str(tmp_path / "root" / "v1"))
    # flip via the Hadoop writer (a raw pathlib overwrite would leave a
    # stale .CURRENT.crc behind on the checksummed local FS)
    write_small_text(spark, f"{root}/CURRENT", "v1")

    import os

    assert not compact_state_pointer(spark, root, upto_batch=1, min_batches=99)
    assert not os.path.exists(live)  # orphan reclaimed despite no compaction
    assert os.path.exists(str(tmp_path / "root" / "v1" / "sigs"))


def test_kbs_thread_error_propagates(spark, tmp_path, monkeypatch):
    """The flags bucket-set collect runs on a daemon driver thread; a
    failure there must fail the batch loudly on join (a swallowed error
    would write flags from a missing bucket set), and the thread itself
    must not outlive the batch."""
    import pytest

    nd = IncrementalNearDup(str(tmp_path / "state"), str(tmp_path / "out"))
    boom = RuntimeError("bucket collect exploded")

    orig = IncrementalNearDup._bucket_ids

    def failing(self, df, cols):
        # the flags collect is the only id-keyed _bucket_ids call in a
        # fresh minhash-only batch 0 (no history to probe)
        if cols == [self.id_col]:
            raise boom
        return orig(self, df, cols)

    monkeypatch.setattr(IncrementalNearDup, "_bucket_ids", failing)
    with pytest.raises(RuntimeError, match="bucket collect exploded"):
        nd.process_batch(_batch(spark, [("a0", BASE), ("a1", OTHER)]), 0)
    # the failed batch wrote no state (crash contract: state appends last)
    import os

    assert not os.path.exists(str(tmp_path / "state" / "sigs"))


def test_small_batch_mode_is_plan_only(spark, tmp_path):
    """small_batch_mode changes the PLANNER (AQE off + driver-side state
    listings during the batch), never the result: pairs/flags/metrics
    match the default handler row for row across a history probe, and
    the session confs are restored afterwards (even mid-exception the
    context manager restores — here we check the happy path)."""
    near = BASE.replace("wad", "zqwad")
    b0 = [("a0", BASE), ("a1", THIRD)]
    b1 = [("b0", BASE), ("b1", near), ("b2", OTHER)]

    outs = {}
    for label, small in (("default", False), ("small", True)):
        nd = IncrementalNearDup(
            str(tmp_path / label / "state"), str(tmp_path / label / "out"),
            families=("minhash", "simhash", "exact"),
            small_batch_mode=small,
        )
        nd.process_batch(_batch(spark, b0), 0)
        nd.process_batch(_batch(spark, b1), 1)
        outs[label] = {
            t: sorted(
                map(
                    tuple,
                    spark.read.parquet(str(tmp_path / label / "out" / t)).collect(),
                ),
                key=repr,
            )
            for t in ("pairs", "flags", "metrics")
        }

    assert outs["small"] == outs["default"]
    # confs restored to the session defaults after the small-mode batches
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert (
        spark.conf.get("spark.sql.sources.parallelPartitionDiscovery.threshold")
        == "32"
    )


def test_mismatched_state_format_is_rejected(spark, tmp_path):
    """The sig encoding is baked into persisted sigs AND band keys
    (xxhash64 over the slots): probing format-1 state (64-bit slots)
    with format-2 signatures would hash to different band keys and
    silently lose every cross-batch match. The meta marker turns a
    format mismatch into a loud error — including legacy markers
    written before the key existed (implicit format 1)."""
    import pytest
    from cc_net_spark.streaming.incremental_neardup import STATE_FORMAT
    from cc_net_spark.sources.hadoop_fs import write_small_text

    nd = IncrementalNearDup(str(tmp_path / "state"), str(tmp_path / "out"))
    nd.process_batch(_batch(spark, [("a0", BASE)]), 0)
    marker = str(tmp_path / "state" / "meta" / "meta.json")
    meta = json.loads((tmp_path / "state" / "meta" / "meta.json").read_text())
    assert meta["state_format"] == STATE_FORMAT

    # pin an older format into the marker: a fresh handler must refuse
    meta["state_format"] = STATE_FORMAT - 1
    write_small_text(spark, marker, json.dumps(meta))
    stale = IncrementalNearDup(str(tmp_path / "state"), str(tmp_path / "out2"))
    with pytest.raises(ValueError, match="state_format"):
        stale.process_batch(_batch(spark, [("b0", BASE)]), 1)

    # legacy marker with no key at all = format 1 -> same refusal
    del meta["state_format"]
    write_small_text(spark, marker, json.dumps(meta))
    legacy = IncrementalNearDup(str(tmp_path / "state"), str(tmp_path / "out3"))
    with pytest.raises(ValueError, match="state_format"):
        legacy.process_batch(_batch(spark, [("c0", BASE)]), 2)


def test_wide_batch_rowgroup_skipping_on_compacted_state(spark, tmp_path):
    """Verdict round-5 item: a batch whose keys span every ``_kb`` bucket
    defeats directory pruning — the compacted state must still skip at
    the ROW-GROUP level. Evidence, all three layers:

    (a) storage: compact_state writes each bucket key-sorted with small
        row groups; pyarrow footer math shows the probe's key set
        intersects strictly fewer row-group bytes than the full table;
    (b) plan: the history read pushes the literal key set to the Parquet
        scan (PushedFilters carries In(key, ...));
    (c) behavior: a wide probe over the compacted+swapped state still
        finds exactly the planted duplicates (filters drop nothing)."""
    import io
    import shutil
    from contextlib import redirect_stdout

    import pyarrow.parquet as pq

    from cc_net_spark.streaming.incremental_neardup import compact_state

    state, out = str(tmp_path / "state"), str(tmp_path / "out")
    nd = IncrementalNearDup(
        state, out, n_state_buckets=4, state_filter_keys=256,
    )
    # wide history: 600 docs with disjoint vocabularies -> 600*32 band
    # rows, ~4800 per bucket, so the 4 KB row groups slice each bucket's
    # keyspace into dozens of tight ranges
    hist_rows = [
        (f"h{i:03d}", " ".join(f"{_L[(i // 26) % 26]}{_L[i % 26]}{_L[i // 676]}{w}" for w in WORDS))
        for i in range(600)
    ]
    nd.process_batch(_batch(spark, hist_rows), 0)
    compacted = str(tmp_path / "state_compacted")
    compact_state(
        spark, state, compacted, upto_batch=1, row_group_bytes=4 * 1024
    )
    shutil.rmtree(state)
    shutil.move(compacted, state)

    # the probe: 2 history texts re-arriving under new ids — their band
    # keys hash into EVERY bucket (wide), but the key set is tiny
    probe_rows = [(f"z{i}", hist_rows[i * 289][1]) for i in range(2)]
    nd2 = IncrementalNearDup(
        state, str(tmp_path / "out2"), n_state_buckets=4, state_filter_keys=256,
    )

    # (a) row-group math on the compacted bands table: key-sorted groups
    # + the probe's literal keys => strictly fewer bytes than the table
    from cc_net_spark.operators.minhash import lsh_bands
    from cc_net_spark.operators.signatures import fused_signatures

    probe_sig = fused_signatures(
        _batch(spark, probe_rows), "transcript", "clip_id",
        keep_shingles=False, with_grams=False,
    )
    probe_keys = {
        r["key"]
        for r in lsh_bands(probe_sig, "clip_id", bands=32, rows_per_band=4)
        .select("key").distinct().collect()
    }
    bands_dir = tmp_path / "state" / "bands" / "_batch_id=0"
    total_bytes = hit_bytes = n_groups = 0
    for f in bands_dir.rglob("*.parquet"):
        md = pq.ParquetFile(str(f)).metadata
        ki = next(
            i for i in range(len(md.schema))
            if md.schema.column(i).name == "key"
        )
        prev_max = None
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ki).statistics
            n_groups += 1
            gb = md.row_group(g).total_byte_size
            total_bytes += gb
            if any(st.min <= k <= st.max for k in probe_keys):
                hit_bytes += gb
            # sorted within the file: min/max runs are monotone
            if prev_max is not None:
                assert st.min >= prev_max, (f, g)
            prev_max = st.max
    assert n_groups >= 8, n_groups  # row_group_bytes really split groups
    assert 0 < hit_bytes < total_bytes, (hit_bytes, total_bytes)

    # (b) the pushed filter reaches the scan
    h = nd2._history(
        spark, nd2.bands_path, 1, [0, 1, 2, 3],
        key_in=("key", sorted(probe_keys)),
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        h.explain("formatted")
    plan = buf.getvalue()
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "In(key" in pushed[0], plan

    # (c) end-to-end: the wide probe still finds exactly its duplicates
    nd2.process_batch(_batch(spark, probe_rows), 1)
    flags = {
        r["clip_id"]: r["is_near_dup"]
        for r in spark.read.parquet(str(tmp_path / "out2" / "flags"))
        .filter(F.col("_batch_id") == 1)
        .collect()
    }
    assert flags == {f"z{i}": True for i in range(2)}
    pairs = spark.read.parquet(str(tmp_path / "out2" / "pairs")).filter(
        F.col("_batch_id") == 1
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.select("id_a", "id_b").collect()}
    for i in range(2):
        assert any(f"h{i * 289:03d}" in p and f"z{i}" in p for p in got), got
