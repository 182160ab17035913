"""Exact-dedup semantics transliterated from the reference's
``tests/test_dedup.py`` (fixtures and expected values kept verbatim; the
machinery under test is the Spark-native build/probe implementation)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cc_net_spark.functions.hashing import str_hash
from cc_net_spark.operators import exact_dedup as ed


def text(*lines):
    return "\n".join(lines)


def make_docs(spark, docs):
    rows = [(i, text(*lines)) for i, lines in enumerate(docs)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def collect_docs(df):
    rows = df.orderBy("doc_id").collect()
    return [
        dict(
            text=r["text"],
            original_nlines=r["original_nlines"],
            nlines=r["nlines"],
            line_ids=list(r["line_ids"]),
        )
        for r in rows
    ]


def test_simple_dedup_keep_first(spark):
    # ``tests/test_dedup.py:49-70`` — one-pass keep-first semantics
    docs = make_docs(
        spark,
        [
            ["_Hello", "_World", "I'm so original"],
            ["_world", "I'm originaler", "_Hello"],
        ],
    )
    got = collect_docs(ed.deduplicate_keep_first(docs, "text", "doc_id"))
    assert got == [
        dict(
            text=text("_Hello", "_World", "I'm so original"),
            original_nlines=3,
            nlines=3,
            line_ids=[0, 1, 2],
        ),
        dict(text="I'm originaler", original_nlines=3, nlines=1, line_ids=[1]),
    ]


def test_hash_table_contents(spark):
    # ``tests/test_dedup.py:73-87`` — build side produces exactly
    # {str_hash(normalized): seen_twice}
    docs = make_docs(
        spark,
        [
            ["_Hello", "_World", "I'm so original"],
            ["_world", "I'm originaler", "_Hello"],
        ],
    )
    hashes = ed.build_hashes(ed.paragraph_hashes(docs, "text", "doc_id"))
    got = {r["hash"]: r["is_dup"] for r in hashes.collect()}
    expected = {
        str_hash(l): l.startswith("_")
        for l in ["_hello", "_world", "i'm so original", "i'm originaler"]
    }
    assert got == expected


def test_dedup_from_prebuilt_hashes(spark):
    # ``tests/test_dedup.py:106-137`` — probe against an external hash table;
    # 'world' was added only once so it is NOT a duplicate.
    docs = make_docs(
        spark,
        [
            ["_Hello", "World", "I'm so original"],
            ["Good morning", "World", "I'm originaler"],
        ],
    )
    seen = ["_hello", "i'm originaler", "world"]
    rows = [(str_hash(h), h != "world") for h in seen]
    hashes = spark.createDataFrame(rows, "hash long, is_dup boolean")
    got = collect_docs(ed.remove_duplicates(docs, hashes, "text", "doc_id"))
    assert got == [
        dict(
            text=text("World", "I'm so original"),
            original_nlines=3,
            nlines=2,
            line_ids=[1, 2],
        ),
        dict(
            text=text("Good morning", "World"),
            original_nlines=3,
            nlines=2,
            line_ids=[0, 1],
        ),
    ]


def test_two_pass_build_then_probe(spark):
    # ``tests/test_dedup.py:140-186`` — build over two parts, probe each part;
    # all copies of '_World' are removed, singletons survive.
    part_0 = [["Hello", "_World", "I'm so original"]]
    part_1 = [["Good morning", "_World", "I'm originaler"]]
    docs = make_docs(spark, part_0 + part_1)
    hashes = ed.build_hashes(ed.paragraph_hashes(docs, "text", "doc_id"))

    got = collect_docs(ed.remove_duplicates(docs, hashes, "text", "doc_id"))
    assert got == [
        dict(
            text=text("Hello", "I'm so original"),
            original_nlines=3,
            nlines=2,
            line_ids=[0, 2],
        ),
        dict(
            text=text("Good morning", "I'm originaler"),
            original_nlines=3,
            nlines=2,
            line_ids=[0, 2],
        ),
    ]

    # hash table contents golden (``tests/test_dedup.py:184-186``)
    words = [w for part in (part_0, part_1) for doc in part for w in doc]
    expected = {str_hash(s.lower()): s.startswith("_") for s in words}
    got_hashes = {r["hash"]: r["is_dup"] for r in hashes.collect()}
    assert got_hashes == expected


def test_probe_is_idempotent(spark):
    # Running the probe twice must be a no-op (``tests/test_dedup.py:153-159``
    # runs DuplicatesRemover twice over the same part).
    docs = make_docs(spark, [["Hello", "_World", "I'm so original", "Hello"]])
    hashes = spark.createDataFrame(
        [(str_hash("_world"), True)], "hash long, is_dup boolean"
    )
    once = ed.remove_duplicates(docs, hashes, "text", "doc_id")
    twice = ed.remove_duplicates(once, hashes, "text", "doc_id")
    a = collect_docs(once)
    b = collect_docs(twice)
    assert a == b
    # in-doc repeat 'Hello' keeps only the first occurrence, and line_ids
    # index the ORIGINAL doc even after a re-run
    assert a == [
        dict(text=text("Hello", "I'm so original"), original_nlines=4, nlines=2, line_ids=[0, 2])
    ]


def test_doc_vanishes_when_everything_is_dup(spark):
    docs = make_docs(spark, [["same", "same"], ["same"], ["unique line"]])
    out = ed.deduplicate_two_pass(docs, "text", "doc_id")
    got = collect_docs(out)
    assert got == [dict(text="unique line", original_nlines=1, nlines=1, line_ids=[0])]


def test_merge_hashes(spark):
    # present in both => dup (``cc_net/dedup.py:106-113``)
    h1 = spark.createDataFrame(
        [(1, False), (2, True), (3, False)], "hash long, is_dup boolean"
    )
    h2 = spark.createDataFrame(
        [(3, False), (4, False), (2, False)], "hash long, is_dup boolean"
    )
    got = {r["hash"]: r["is_dup"] for r in ed.merge_hashes(h1, h2).collect()}
    assert got == {1: False, 2: True, 3: True, 4: False}


def test_normalization_feeds_hashing(spark):
    # case/digit/unicode-punct variants normalize to the same hash => both
    # dropped. NB: only the 36-entry unicode punct set is removed — ASCII
    # punctuation survives normalization (``cc_net/text_normalizer.py:47,188``).
    docs = make_docs(spark, [["Price 123！", "unrelated a"], ["pRiCe 456", "unrelated b"]])
    out = ed.deduplicate_two_pass(docs, "text", "doc_id")
    got = collect_docs(out)
    assert [d["text"] for d in got] == ["unrelated a", "unrelated b"]


def test_dedup_metrics(spark):
    docs = make_docs(spark, [["a", "b"], ["a", "c"]])
    out = ed.deduplicate_two_pass(docs, "text", "doc_id")
    m = ed.dedup_metrics(docs, out, "doc_id")
    assert m["docs_in"] == 2 and m["docs_kept"] == 2
    assert m["lines_kept"] == 2 and m["lines_in_kept_docs"] == 4
