"""Incremental substring pass: the batch-over-snapshots job that covers
the family the streaming handler deliberately excludes — a shard append
re-runs ONLY the appended shard's gram scan (content fingerprints skip
the rest), and the result equals the from-scratch batch pass."""

from pyspark.sql import functions as F

from cc_net_spark.operators.substring import substring_candidate_pairs
from cc_net_spark.streaming.incremental_substring import (
    incremental_substring_pass,
)

_L = "abcdefghijklmnopqrstuvwxyz"
RUN = " ".join(f"q{_L[i // 26]}{_L[i % 26]}" for i in range(30))  # shared run


def _doc(i: int, with_run: bool) -> tuple[str, str]:
    uniq = " ".join(f"{_L[i % 26]}{_L[(i + j) % 26]}z" for j in range(25))
    text = f"{uniq} {RUN}" if with_run else uniq
    return (f"d{i:02d}", text)


def _write_shard(spark, root, name, rows):
    spark.createDataFrame(rows, "clip_id string, transcript string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(root / name))


def test_append_rescans_only_new_shard(spark, tmp_path):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    # shard0: d00 (run) + d01..d03; shard1: d04 (run) + d05..d07
    _write_shard(spark, corpus, "shard0", [_doc(0, True)] + [_doc(i, False) for i in range(1, 4)])
    _write_shard(spark, corpus, "shard1", [_doc(4, True)] + [_doc(i, False) for i in range(5, 8)])

    work = tmp_path / "work"
    kw = dict(length=30, winnow_window=5, gram_cap=100)
    r1 = incremental_substring_pass(spark, work, corpus, **kw)
    assert not any(m.get("skipped") for m in r1.values())
    pairs1 = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(str(work / "substring_overlaps")).collect()
    }
    assert pairs1 == {("d00", "d04")}

    # append shard2 with another run-carrying doc
    _write_shard(spark, corpus, "shard2", [_doc(8, True), _doc(9, False)])
    r2 = incremental_substring_pass(spark, work, corpus, **kw)
    # ONLY the appended shard's gram stage ran; old shards skipped
    assert r2["grams_shard0"].get("skipped") is True
    assert r2["grams_shard1"].get("skipped") is True
    assert "skipped" not in r2["grams_shard2"]
    # the pair + verify stages re-ran (their input set changed)
    assert "skipped" not in r2["substring_pairs"]
    assert "skipped" not in r2["substring_overlaps"]

    got = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(str(work / "substring_overlaps")).collect()
    }
    assert got == {("d00", "d04"), ("d00", "d08"), ("d04", "d08")}

    # ...and equals the from-scratch batch pass over the full corpus
    full = spark.read.option("recursiveFileLookup", "true").parquet(str(corpus))
    exp = {
        (r["id_a"], r["id_b"])
        for r in substring_candidate_pairs(
            full, "transcript", "clip_id",
            length=30, winnow_window=5, gram_cap=100,
        ).collect()
    }
    assert got == exp

    # third run with nothing new: everything skips
    r3 = incremental_substring_pass(spark, work, corpus, **kw)
    assert all(m.get("skipped") for m in r3.values())


def test_overlap_length_threshold(spark, tmp_path):
    """min_length defaults to the winnowing detection guarantee
    (length + winnow_window - 1): sub-threshold overlaps are dropped by
    the exact verify stage even if a gram collides."""
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    short_run = RUN[:40]  # >= length(30) but < 30 + 5 - 1 + margin
    rows = [
        ("a0", f"xx {RUN} yy"),
        ("a1", f"zz {RUN} ww"),
        ("b0", f"pp {short_run}"),
        ("b1", f"qq {short_run}"),
    ]
    _write_shard(spark, corpus, "shard0", rows)
    work = tmp_path / "work"
    incremental_substring_pass(
        spark, work, corpus, length=30, winnow_window=5, min_length=120
    )
    got = {
        (r["id_a"], r["id_b"], r["overlap_len"])
        for r in spark.read.parquet(str(work / "substring_overlaps")).collect()
    }
    # only the long-run pair survives a 120-char exact-overlap floor
    assert {(a, b) for a, b, _ in got} == {("a0", "a1")}
    assert all(n >= 120 for _, _, n in got)
