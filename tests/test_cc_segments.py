"""Distributed CC segment reader (sources/cc_segments.py) vs the
reference's CCSegmentsReader / CCShardReader / dl_cc_100 semantics
(``cc_net/process_wet_file.py:165-253``, ``cc_net/tools/dl_cc_100.py``).

All fixtures are local ``file://`` URLs — nothing leaves the box.
"""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from cc_net_spark.sources.cc_segments import (
    read_cc_segments,
    reconstruct_from_segments,
    segment_url,
    shard_segments,
)


def _wet(urls_bodies: list[tuple[str, str, str]]) -> str:
    """Build a WET blob from (url, title, body) triples."""
    recs = []
    for url, title, body in urls_bodies:
        recs.append(
            "WARC/1.0\n"
            "WARC-Type: conversion\n"
            f"WARC-Target-URI: {url}\n"
            "WARC-Date: 2019-01-01T00:00:00Z\n"
            f"WARC-Block-Digest: sha1:{abs(hash(url)) % 10**8:08d}\n"
            f"Content-Length: {len(body)}\n"
            "\n"
            f"{title}\n{body}\n"
        )
    return "\n\n".join(recs)


@pytest.fixture
def seg_fixture(tmp_path):
    """Two segments (one gzipped) under a file:// root, 3+2 docs."""
    root = tmp_path / "cc"
    (root / "crawl/seg").mkdir(parents=True)
    body = "line one of the body\n" * 6
    s1 = _wet(
        [
            ("http://a.example.com/1", "Doc A1", body + "unique a1"),
            ("http://a.example.com/2", "Doc A2", body + "unique a2"),
            ("http://b.example.org/1", "Doc B1", body + "unique b1"),
        ]
    )
    s2 = _wet(
        [
            ("http://c.example.net/1", "Doc C1", body + "unique c1"),
            ("http://c.example.net/2", "Doc C2", "short"),  # < min_len
        ]
    )
    (root / "crawl/seg/seg-00001.warc.wet").write_text(s1)
    (root / "crawl/seg/seg-00002.warc.wet.gz").write_bytes(
        gzip.compress(s2.encode())
    )
    return root


def test_segment_url_join_and_passthrough():
    assert (
        segment_url("crawl/seg-1.warc.wet.gz", "https://mirror")
        == "https://mirror/crawl/seg-1.warc.wet.gz"
    )
    assert segment_url("file:///x/y.wet", "https://mirror") == "file:///x/y.wet"


def test_shard_segments_partition_and_cap():
    segs = [f"s{i:03d}" for i in range(100)]
    # num_shards derived from per-shard size: 100 // 40 = 2 shards
    sharded = [shard_segments(segs, i, num_segments_per_shard=40) for i in range(2)]
    assert all(len(s) == 40 for s in sharded)  # capped at 40, not 50
    assert sharded[0] == segs[:40] and sharded[1] == segs[50:90]
    # explicit num_shards covers everything exactly once when cap is off
    full = [shard_segments(segs, i, num_shards=7, num_segments_per_shard=-1) for i in range(7)]
    flat = [s for sh in full for s in sh]
    assert flat == segs


def test_read_cc_segments_distributed_fetch_parse(spark, seg_fixture):
    segs = ["crawl/seg/seg-00001.warc.wet", "crawl/seg/seg-00002.warc.wet.gz"]
    df = read_cc_segments(
        spark, segs, url_root=seg_fixture.as_uri(), min_len=20
    )
    rows = {r["url"]: r for r in df.collect()}
    # 4 docs survive min_len (C2 is short)
    assert len(rows) == 4
    a1 = rows["http://a.example.com/1"]
    assert a1["title"] == "Doc A1"
    assert a1["cc_segment"] == segs[0]
    assert a1["source_domain"] == "a.example.com"
    assert a1["raw_content"].endswith("unique a1")
    assert a1["nlines"] == 7
    # the gzipped segment parsed too, tagged with its own segment name
    assert rows["http://c.example.net/1"]["cc_segment"] == segs[1]


def test_read_cc_segments_cache(spark, seg_fixture, tmp_path):
    segs = ["crawl/seg/seg-00001.warc.wet"]
    cache = tmp_path / "cache"
    df = read_cc_segments(
        spark, segs, url_root=seg_fixture.as_uri(), min_len=20,
        cache_dir=str(cache),
    )
    assert df.count() == 3
    assert (cache / "seg-00001.warc.wet").exists()
    # poison the origin: a cached re-read must not notice
    (seg_fixture / "crawl/seg/seg-00001.warc.wet").write_text("garbage")
    df2 = read_cc_segments(
        spark, segs, url_root=seg_fixture.as_uri(), min_len=20,
        cache_dir=str(cache),
    )
    assert df2.count() == 3


def test_reconstruct_from_segments(spark, seg_fixture):
    segs = ["crawl/seg/seg-00001.warc.wet", "crawl/seg/seg-00002.warc.wet.gz"]
    docs = read_cc_segments(spark, segs, url_root=seg_fixture.as_uri(), min_len=20)
    # minified metadata keeping lines 0 and 2 of two docs
    digests = {
        r["url"]: r["digest"]
        for r in docs.select("url", "digest").collect()
    }
    meta = spark.createDataFrame(
        [
            (digests["http://a.example.com/1"], [0, 2]),
            (digests["http://c.example.net/1"], [1]),
        ],
        "digest string, line_ids array<int>",
    )
    rec = reconstruct_from_segments(
        spark, meta, segs, url_root=seg_fixture.as_uri(), min_len=20
    ).collect()
    by_digest = {r["digest"]: r for r in rec}
    assert len(by_digest) == 2
    a1 = by_digest[digests["http://a.example.com/1"]]
    assert a1["raw_content"] == "line one of the body\nline one of the body"
    assert a1["nlines"] == 2 and a1["length"] == len(a1["raw_content"])
    c1 = by_digest[digests["http://c.example.net/1"]]
    assert c1["raw_content"] == "line one of the body"
