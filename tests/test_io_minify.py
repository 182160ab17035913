"""Sources/sinks/minify/incremental-streaming coverage (SURVEY.md §2.1-2.3,
§2.5 MetadataFetcher, §2.10)."""

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from cc_net_spark.operators import exact_dedup as ed
from cc_net_spark.operators.minify import minify, unminify
from cc_net_spark.sources.jsonl import parse_wet, read_jsonl, read_typed_tsv
from cc_net_spark.sources.sinks import regroup, write_jsonl, write_partitioned


def test_read_jsonl_lenient(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "hello"}),
        "THIS IS NOT JSON {",
        json.dumps({"doc_id": 2, "text": "world"}),
        json.dumps({"doc_id": 3}),  # missing field => null, not corrupt
    ]
    p.write_text("\n".join(lines))
    df, metrics = read_jsonl(spark, str(p), "doc_id long, text string")
    rows = {r["doc_id"]: r["text"] for r in df.collect()}
    assert rows == {1: "hello", 2: "world", 3: None}
    m = metrics.collect()[0]
    assert m["n_corrupt"] == 1


def test_read_typed_tsv(spark, tmp_path):
    p = tmp_path / "in.tsv"
    p.write_text(
        "name\tscore%f\tcount%i\tok%b\t_\n"
        'alpha\t1.5\t3\ttrue\t{"extra": "x"}\n'
        'beta\t2.0\t4\tfalse\t{"extra": "y"}\n'
    )
    df = read_typed_tsv(spark, str(p))
    rows = sorted(df.collect(), key=lambda r: r["name"])
    assert rows[0]["name"] == "alpha" and rows[0]["score"] == 1.5
    assert rows[0]["count"] == 3 and rows[0]["ok"] is True
    assert rows[0]["extra"] == "x"
    assert dict(df.dtypes)["score"] == "double" and dict(df.dtypes)["count"] == "bigint"


def test_parse_wet(spark, tmp_path):
    wet = (
        "WARC/1.0\n"
        "WARC-Type: conversion\n"
        "WARC-Target-URI: http://example.com/a\n"
        "WARC-Date: 2019-01-01T00:00:00Z\n"
        "WARC-Block-Digest: sha1:AAAA\n"
        "Content-Length: 60\n"
        "\n"
        "Title A\n" + ("body line one of a\n" * 4) +
        "\n\n"
        "WARC/1.0\n"
        "WARC-Type: request\n"
        "\n"
        "ignored\n"
        "\n\n"
        "WARC/1.0\n"
        "WARC-Type: conversion\n"
        "WARC-Target-URI: http://example.com/b\n"
        "WARC-Block-Digest: sha1:BBBB\n"
        "Content-Length: 10\n"
        "\n"
        "Title B\nshort\n"
    )
    (tmp_path / "f.warc.wet").write_text(wet)
    docs = parse_wet(spark, str(tmp_path / "*.wet"), min_len=20).collect()
    # doc B is dropped by min_len; request record ignored
    assert len(docs) == 1
    d = docs[0]
    assert d["url"] == "http://example.com/a"
    assert d["title"] == "Title A"
    assert d["digest"] == "sha1:AAAA"
    assert d["nlines"] == 4
    assert d["raw_content"].startswith("body line one")


def test_sinks_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", f"t{i}") for i in range(20)],
        "doc_id long, lang string, text string",
    )
    write_jsonl(df, str(tmp_path / "out_json"), max_records_per_file=5)
    back = spark.read.json(str(tmp_path / "out_json"))
    assert back.count() == 20
    assert len(list((tmp_path / "out_json").glob("part-*"))) >= 4

    write_partitioned(df, str(tmp_path / "out_part"), ["lang"])
    assert (tmp_path / "out_part" / "lang=en").exists()
    assert spark.read.parquet(str(tmp_path / "out_part")).count() == 20

    regroup(spark.read.parquet(str(tmp_path / "out_part")), str(tmp_path / "out_regroup"), target_files=2)
    files = list((tmp_path / "out_regroup").glob("part-*.parquet"))
    assert len(files) <= 2
    assert spark.read.parquet(str(tmp_path / "out_regroup")).count() == 20


def test_minify_unminify_roundtrip(spark):
    # dedup, minify, then reconstruct from originals: text must round-trip
    # (reference ``tests/test_minify.py:122-153`` semantics)
    docs = spark.createDataFrame(
        [
            (1, "keep me\ndup line\nunique one"),
            (2, "dup line\nother text\ndup line"),
        ],
        "doc_id long, raw_content string",
    )
    deduped = ed.deduplicate_two_pass(docs, "raw_content", "doc_id")
    meta = minify(deduped, "doc_id")
    assert set(meta.columns) == {"doc_id", "line_ids"}
    rebuilt = unminify(meta, docs, "raw_content", "doc_id")
    a = {r["doc_id"]: r["raw_content"] for r in deduped.collect()}
    b = {r["doc_id"]: r["raw_content"] for r in rebuilt.collect()}
    assert a == b
    assert {r["doc_id"]: r["nlines"] for r in rebuilt.collect()} == {1: 2, 2: 1}


def test_regroup_by_size(spark, tmp_path):
    """Size-targeted compaction: file count = ceil(total_bytes/target),
    data preserved."""
    from cc_net_spark.sources.sinks import regroup_by_size

    src = tmp_path / "src"
    spark.range(20000).repartition(16).write.parquet(str(src))
    total = sum(f.stat().st_size for f in src.rglob("*") if f.is_file())
    target = total // 3  # expect ~3-4 files
    n = regroup_by_size(spark, str(src), str(tmp_path / "dst"), target_bytes=target)
    out_files = list((tmp_path / "dst").glob("*.parquet"))
    assert len(out_files) == n <= 5
    assert spark.read.parquet(str(tmp_path / "dst")).count() == 20000


def test_minify_wire_compat_roundtrip(spark):
    """Reference wire format: base64 <u2 line_ids + sha1-digest join key
    (``cc_net/minify.py:38-75``). Byte parity checked against the known
    encoding; unminify transparently decodes the string form."""
    import base64 as b64
    import hashlib

    from cc_net_spark.operators.minify import (
        doc_key,
        encode_line_ids,
        decode_line_ids,
        minify,
        unminify,
    )
    from cc_net_spark.functions.hashing import str_hash

    assert encode_line_ids([0, 1, 2]) == "AAABAAIA"
    for ids in ([], [0], [7, 0, 65535], list(range(100))):
        assert decode_line_ids(encode_line_ids(ids)) == ids
    s = "some paragraph"
    digest = "sha1:" + b64.b32encode(hashlib.sha1(s.encode()).digest()).decode()
    # internal width (8): same formula as the engine's sha1-u64 dedup hash
    assert doc_key(digest) == str_hash(s)
    # reference width (4): byte-exact get_doc_key (cc_net/minify.py:28-30,72-75)
    import numpy as np

    assert doc_key(digest, hash_size=4) == int(
        np.frombuffer(hashlib.sha1(s.encode()).digest()[:4], dtype="<u4")[0]
    )

    # hash-dump codec (cc_net/minify.py:43-58): reference wire format is
    # 4-byte prefixes (HASH_SIZE=4); 8-byte round-trips internal dumps
    from cc_net_spark.operators.minify import decode_hashes, encode_hashes

    hs = [hashlib.sha1(f"line {i}".encode()).digest() for i in range(5)]
    enc = encode_hashes(hs)  # default = reference width
    assert enc == b64.b64encode(b"".join(h[:4] for h in hs)).decode()
    assert decode_hashes(enc) == [h[:4] for h in hs]
    enc8 = encode_hashes(hs, hash_size=8)
    assert decode_hashes(enc8, hash_size=8) == [h[:8] for h in hs]

    docs = spark.createDataFrame(
        [(1, "a\nb\na"), (2, "c\nd")], "doc_id long, raw_content string"
    )
    deduped = ed.deduplicate_two_pass(docs, "raw_content", "doc_id")
    meta = minify(deduped, "doc_id", wire_compat=True)
    assert dict(meta.dtypes)["line_ids"] == "string"
    rebuilt = unminify(meta, docs, "raw_content", "doc_id")
    a = {r["doc_id"]: r["raw_content"] for r in deduped.collect()}
    b = {r["doc_id"]: r["raw_content"] for r in rebuilt.collect()}
    assert a == b


def test_incremental_streaming_dedup(spark, tmp_path):
    from cc_net_spark.streaming.incremental import run_incremental_dedup

    inp = tmp_path / "in"
    inp.mkdir()
    (inp / "batch0.json").write_text(
        json.dumps({"doc_id": 1, "text": "shared line\nalpha"})
        + "\n"
        + json.dumps({"doc_id": 2, "text": "beta\ngamma"})
    )
    run_incremental_dedup(
        spark,
        str(inp),
        "doc_id long, text string",
        str(tmp_path / "hashes"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    out1 = spark.read.parquet(str(tmp_path / "out"))
    assert out1.count() == 2  # nothing duplicated yet

    # second shard arrives: its copy of "shared line" is now a known dup
    (inp / "batch1.json").write_text(
        json.dumps({"doc_id": 3, "text": "shared line\ndelta"})
    )
    run_incremental_dedup(
        spark,
        str(inp),
        "doc_id long, text string",
        str(tmp_path / "hashes"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    out2 = spark.read.parquet(str(tmp_path / "out"))
    rows = {r["doc_id"]: r["text"] for r in out2.collect()}
    assert rows[3] == "delta"  # "shared line" removed cross-batch
    assert out2.count() == 3  # batch0 rows not reprocessed (checkpoint)

    # hashes table is append-only, partitioned by batch: each batch's
    # partition holds only that batch's distinct hashes (write ∝ batch,
    # not corpus — the 100 TB requirement)
    hashes = spark.read.parquet(str(tmp_path / "hashes"))
    per_batch = {
        r["_batch_id"]: r["n"]
        for r in hashes.groupBy("_batch_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_batch[0] == 4  # shared line, alpha, beta, gamma
    assert per_batch[1] == 2  # shared line (flagged dup), delta


def test_incremental_dedup_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-processing a batch must not
    re-merge its hashes (which would flag the whole batch as duplicate
    and lose its docs) nor duplicate output rows."""
    from cc_net_spark.streaming.incremental import IncrementalDeduper

    dedup = IncrementalDeduper(
        str(tmp_path / "hashes"), str(tmp_path / "out"), "text", "doc_id"
    )
    b0 = spark.createDataFrame(
        [(1, "shared line\nalpha"), (2, "beta\ngamma")], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(3, "shared line\ndelta")], "doc_id long, text string"
    )
    dedup.process_batch(b0, 0)
    dedup.process_batch(b1, 1)

    def snapshot():
        out = spark.read.parquet(str(tmp_path / "out"))
        return sorted((r["doc_id"], r["text"]) for r in out.collect())

    first = snapshot()
    assert (3, "delta") in first and len(first) == 3
    # replay BOTH batches (simulated failure-recovery) — state unchanged
    dedup.process_batch(b0, 0)
    dedup.process_batch(b1, 1)
    assert snapshot() == first
    hashes = spark.read.parquet(str(tmp_path / "hashes"))
    assert hashes.count() == 6  # 4 + 2, no growth on replay


def test_incremental_dedup_history_probe_prunes_buckets(spark, tmp_path):
    """Round-4 layout parity with the near-dup state: the hashes table
    is hive-partitioned (_batch_id, _kb) and the history probe's plan
    prunes on BOTH levels — per-batch history IO is bounded by the
    batch's hash spread, not the corpus."""
    import io
    import os
    from contextlib import redirect_stdout

    from cc_net_spark.streaming.incremental import IncrementalDeduper

    dedup = IncrementalDeduper(
        str(tmp_path / "hashes"), str(tmp_path / "out"), n_state_buckets=32
    )
    docs0 = spark.createDataFrame(
        [(i, f"para {i} alpha\npara {i} beta") for i in range(40)],
        "doc_id long, text string",
    )
    dedup.process_batch(docs0, 0)
    b0 = tmp_path / "hashes" / "_batch_id=0"
    assert any(d.startswith("_kb=") for d in os.listdir(b0))

    pruned = dedup._history(spark, 1, kbs=[0, 1])
    buf = io.StringIO()
    with redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "_kb" in pf[0] and "_batch_id" in pf[0], plan

    # and the cross-batch dedup still works through the pruned probe
    dup = spark.createDataFrame(
        [(100, "para 7 alpha\nfresh line here")], "doc_id long, text string"
    )
    dedup.process_batch(dup, 1)
    out = spark.read.parquet(str(tmp_path / "out")).filter("_batch_id = 1")
    texts = [r["text"] for r in out.collect()]
    assert texts == ["fresh line here"]  # the repeated paragraph dropped
