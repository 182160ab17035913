"""Remote-file materialization + cirrus source (SURVEY.md §2.1).

Network-free: ``file://`` URLs and a loopback ``http.server`` stand in
for the remote side, so parity with ``jsonql.open_remote_file`` /
``get_wiki_cirrus`` is exercised without touching any external host.
"""

from __future__ import annotations

import gzip
import json
import threading
import urllib.error
from functools import partial
from http.server import HTTPServer, SimpleHTTPRequestHandler
from pathlib import Path

import pytest

from cc_net_spark.sources.remote import (
    dl_cirrus,
    fetch_to_cache,
    get_cirrus_urls,
    open_remote_file,
    read_cirrus,
    request_get_content,
)


@pytest.fixture()
def http_root(tmp_path):
    root = tmp_path / "www"
    root.mkdir()
    handler = partial(SimpleHTTPRequestHandler, directory=str(root))
    srv = HTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield root, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_open_remote_file_plain_and_gz(http_root):
    root, base = http_root
    (root / "a.txt").write_text("one\ntwo\n", encoding="utf-8")
    (root / "b.json.gz").write_bytes(gzip.compress("x\ny\n".encode()))
    assert list(open_remote_file(f"{base}/a.txt")) == ["one\n", "two\n"]
    assert list(open_remote_file(f"{base}/b.json.gz")) == ["x\n", "y\n"]


def test_open_remote_file_file_url(tmp_path):
    p = tmp_path / "local.txt"
    p.write_text("hello\n", encoding="utf-8")
    assert list(open_remote_file(p.as_uri())) == ["hello\n"]


def test_open_remote_file_cache_roundtrip(http_root, tmp_path):
    root, base = http_root
    (root / "c.txt").write_text("cached\n", encoding="utf-8")
    cache = tmp_path / "cache" / "c.txt"
    assert list(open_remote_file(f"{base}/c.txt", cache=cache)) == ["cached\n"]
    assert cache.read_text() == "cached\n"
    # second read must come from the cache: poison the origin to prove it
    (root / "c.txt").write_text("changed\n", encoding="utf-8")
    assert list(open_remote_file(f"{base}/c.txt", cache=cache)) == ["cached\n"]


def test_request_404_raises_immediately(http_root):
    _, base = http_root
    with pytest.raises(urllib.error.HTTPError):
        request_get_content(f"{base}/missing.txt", n_retry=3, _sleep=0.0)


def test_request_retries_transport_errors(tmp_path):
    # an unused loopback port: connection refused -> URLError, retried
    with pytest.raises(urllib.error.URLError):
        request_get_content("http://127.0.0.1:1/x", n_retry=2, _sleep=0.0)


def test_fetch_to_cache_idempotent(http_root, tmp_path):
    root, base = http_root
    (root / "d.txt").write_text("v1", encoding="utf-8")
    cache = tmp_path / "d.txt"
    assert fetch_to_cache(f"{base}/d.txt", cache).read_bytes() == b"v1"
    (root / "d.txt").write_text("v2", encoding="utf-8")
    # cache hit: origin not consulted again
    assert fetch_to_cache(f"{base}/d.txt", cache).read_bytes() == b"v1"


CIRRUS_INDEX = """
<html><a href="../">..</a><a href="current/">current</a>
<a href="20260301/">20260301/</a><a href="20260215/">20260215/</a></html>
"""
CIRRUS_DUMP = """
<html>
<a href="enwiki-20260215-cirrussearch-content.json.gz">en</a>
<a href="frwiki-20260215-cirrussearch-content.json.gz">fr</a>
<a href="enwiki-20260215-cirrussearch-general.json.gz">skip</a>
<a href="notes.txt">skip</a>
</html>
"""


def test_get_cirrus_urls_oldest_dump_and_lang_keys():
    urls = get_cirrus_urls(CIRRUS_INDEX, CIRRUS_DUMP, base="http://x/cirrus")
    # oldest date wins (reference: "most recent might be incomplete")
    assert urls == {
        "en": "http://x/cirrus/20260215/enwiki-20260215-cirrussearch-content.json.gz",
        "fr": "http://x/cirrus/20260215/frwiki-20260215-cirrussearch-content.json.gz",
    }


def _write_cirrus_dump(path: Path, docs: list[str]) -> None:
    lines = []
    for i, text in enumerate(docs):
        # cirrus format: index-action line (no opening_text), then doc line
        lines.append(json.dumps({"index": {"_id": str(i)}}))
        lines.append(json.dumps({"title": f"t{i}", "opening_text": text}))
    lines.append(json.dumps({"title": "empty", "opening_text": ""}))
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")


def test_dl_cirrus_and_read_cirrus(http_root, tmp_path, spark):
    root, base = http_root
    plain = tmp_path / "dump.json"
    _write_cirrus_dump(plain, ["Hello, World 42!", "Café au lait."])
    (root / "enwiki-1-cirrussearch-content.json.gz").write_bytes(
        gzip.compress(plain.read_bytes())
    )
    urls = {"en": f"{base}/enwiki-1-cirrussearch-content.json.gz"}
    with pytest.raises(KeyError):
        dl_cirrus("zz", urls, tmp_path / "out")
    local = dl_cirrus("en", urls, tmp_path / "out")
    assert local.name == "en.json.gz"

    got = [r["text"] for r in read_cirrus(spark, str(local)).collect()]
    # byte-parity with the reference extraction: normalize() applied,
    # index-action and empty-opening_text lines dropped
    from cc_net_spark.functions.normalize import normalize

    assert sorted(got) == sorted(
        [normalize("Hello, World 42!"), normalize("Café au lait.")]
    )
    assert normalize("Hello, World 42!") == "hello, world 00!"


def test_read_cirrus_n_docs_cap(tmp_path, spark):
    plain = tmp_path / "dump.json"
    _write_cirrus_dump(plain, [f"doc number {i}" for i in range(10)])
    assert read_cirrus(spark, str(plain), n_docs=3).count() == 3
