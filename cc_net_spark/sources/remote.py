"""Remote-file materialization + wiki-cirrus source (SURVEY.md §2.1).

Spark-native replacements for the reference's two network-facing sources:

* ``open_remote_file`` (``cc_net/jsonql.py:1085-1140``): download a SMALL
  remote file to memory (retry w/ exponential backoff, no retry on 4xx),
  transparently gunzip, optionally cache on disk with an atomic
  tmp-then-rename so concurrent downloaders never see a torn cache file.
  In cc_net this feeds small metadata files (hash lists, stats); bulk
  data never rides this path — so the Spark-first shape is the same:
  materialize to a local/shared cache path, then hand that path to the
  native distributed readers.  ``fetch_to_cache`` is that entry point.
* ``get_wiki_cirrus`` (``cc_net/get_wiki_cirrus.py:31-120``): dump-page
  scraping (``get_cirrus_urls`` — here a pure HTML-string parser with the
  reference's exact dump-name regex, so it is testable offline), download
  (``dl`` via the same retry machinery) and ``opening`` extraction:
  lenient JSON lines -> keep non-empty ``opening_text`` -> byte-parity
  ``normalize`` -> cap at ``n_docs``.  ``read_cirrus`` expresses the
  extraction declaratively so Catalyst prunes to the one needed column.

Only stdlib ``urllib`` is used; tests exercise ``file://`` URLs and a
loopback ``http.server`` — no external data is ever fetched in CI.
"""

from __future__ import annotations

import gzip
import io
import os
import re
import time
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Iterator
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CIRRUS_URL = "https://dumps.wikimedia.org/other/cirrussearch"
# reference: get_wiki_cirrus.py:25 CIRRUS_DUMP_RE
CIRRUS_DUMP_RE = re.compile(r"^(.*)wiki-\d+-cirrussearch-content\.json\.gz")
_HREF_RE = re.compile(r"""<a\s[^>]*href=["']?([^"'\s>]+)["']?""", re.IGNORECASE)


def request_get_content(
    url: str, n_retry: int = 3, _sleep: float = 10.0
) -> bytes:
    """Retrieve the binary content at url, retrying on transient errors.

    Parity with ``jsonql.request_get_content`` (jsonql.py:1090-1111):
    exponential backoff ``sleep * 2**attempt``; a 4xx client error is
    raised immediately (retrying a 404 is pointless), transport errors
    and 5xx are retried ``n_retry`` times.
    """
    last: Exception | None = None
    for i in range(1, n_retry + 1):
        try:
            with urllib.request.urlopen(url) as r:
                return r.read()
        except urllib.error.HTTPError as e:
            if i == n_retry or 400 <= e.code < 500:
                raise
            last = e
        except (urllib.error.URLError, OSError) as e:
            if i == n_retry:
                raise
            last = e
        time.sleep(min(_sleep * 2**i, 60.0))
    raise last  # pragma: no cover - unreachable


def fetch_to_cache(url: str, cache: Path, n_retry: int = 3) -> Path:
    """Materialize ``url`` at ``cache`` (atomic tmp+rename), return the path.

    Idempotent and concurrency-safe the same way the reference is
    (jsonql.py:1131-1139): if another process populated the cache while
    we downloaded, our tmp copy is discarded and theirs wins — both hold
    identical bytes, so last-writer-loses is fine.
    """
    cache = Path(cache)
    if cache.exists():
        return cache
    raw = request_get_content(url, n_retry=n_retry)
    cache.parent.mkdir(parents=True, exist_ok=True)
    tmp = cache.parent / ("tmp." + cache.name)
    tmp.write_bytes(raw)
    if not cache.exists():
        tmp.replace(cache)
    else:
        tmp.unlink()
    return cache


def open_remote_file(url: str, cache: Path | None = None) -> Iterator[str]:
    """Download ``url`` to memory and iterate its text lines.

    Gzip is transparent on a ``.gz`` suffix; with ``cache`` set the raw
    bytes are also persisted (atomically) for the next caller.  Matches
    ``jsonql.open_remote_file`` including the read-from-cache fast path.
    """
    if cache is not None and Path(cache).exists():
        data = Path(cache).read_bytes()
    else:
        data = request_get_content(url)
        if cache is not None:
            cache = Path(cache)
            cache.parent.mkdir(parents=True, exist_ok=True)
            tmp = cache.parent / ("tmp." + cache.name)
            tmp.write_bytes(data)
            if not cache.exists():
                tmp.replace(cache)
            else:
                tmp.unlink()
    buf = io.BytesIO(data)
    f = (
        gzip.open(buf, mode="rt", encoding="utf-8")
        if urllib.parse.urlparse(url).path.endswith(".gz")
        else io.TextIOWrapper(buf, encoding="utf-8")
    )
    with f:
        yield from f


def get_cirrus_urls(
    index_html: str, dump_html: str, date: str | None = None, base: str = CIRRUS_URL
) -> dict[str, str]:
    """Pure-function version of ``get_wiki_cirrus.get_cirrus_urls``.

    The reference scrapes two listing pages with BeautifulSoup; here the
    caller supplies the HTML (fetched via ``request_get_content`` when a
    network exists, or a fixture in tests) and we apply the same
    selection rules: oldest listed dump date ("most recent might be
    incomplete"), then every ``*wiki-<date>-cirrussearch-content.json.gz``
    link keyed by its language prefix.
    """
    if date is None:
        dumps = [
            h.strip("/")
            for h in _HREF_RE.findall(index_html)
            if h.strip("/") not in ("..", "current")
        ]
        if not dumps:
            raise ValueError("no dump dates found in cirrus index page")
        date = min(dumps)
    cirrus_url = "/".join((base, date))
    urls: dict[str, str] = {}
    for href in _HREF_RE.findall(dump_html):
        m = CIRRUS_DUMP_RE.match(href)
        if m:
            urls[m.group(1)] = "/".join((cirrus_url, href))
    if not urls:
        raise ValueError(f"No valid download urls found at {cirrus_url}")
    return urls


def dl_cirrus(lang: str, urls: dict[str, str], output_dir: Path) -> Path:
    """``get_wiki_cirrus.dl`` minus the scraping: fetch one language dump."""
    if lang not in urls:
        raise KeyError(
            f"lang {lang!r} not found. Available languages: {sorted(urls)}"
        )
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    return fetch_to_cache(urls[lang], output_dir / (lang + ".json.gz"))


def read_cirrus(
    spark: SparkSession,
    path: str,
    n_docs: int | None = 1_000_000,
    normalized_col: str = "text",
) -> DataFrame:
    """Cirrus-dump ``opening`` extraction as a declarative plan.

    Parity with ``get_wiki_cirrus.extract_opening_text`` (:52-65): lenient
    JSON lines, skip docs without ``opening_text``, byte-parity
    ``text_normalizer.normalize``, stop after ``n_docs``.  The cirrus
    dump interleaves index-action lines (no ``opening_text``) with doc
    lines — the non-null filter drops them exactly like the reference's
    ``doc.get("opening_text")`` guard.  Schema is pinned to the one used
    column so the JSON parser never materializes the (large) remainder
    of each doc, and normalization runs as an Arrow-batched pandas UDF.
    """
    from pyspark.sql.functions import pandas_udf

    from cc_net_spark.functions.normalize import normalize

    # lambda form: PEP-563 stringified hints defeat pandas eval-type
    # inference for defs nested under `from __future__ import annotations`
    normalize_udf = pandas_udf(lambda s: s.map(normalize), "string")

    df = (
        spark.read.option("mode", "PERMISSIVE")
        .schema("opening_text string")
        .json(path)
        .filter(F.col("opening_text").isNotNull() & (F.col("opening_text") != ""))
    )
    if n_docs is not None:
        df = df.limit(n_docs)
    return df.select(normalize_udf(F.col("opening_text")).alias(normalized_col))
