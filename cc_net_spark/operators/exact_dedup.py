"""Exact paragraph dedup — Spark-native re-expression of the reference's
hash build + probe pipeline (semantic anchor, SURVEY.md §2.4).

Reference semantics preserved:

* paragraph = a ``"\\n"``-split line of the text field (``cc_net/dedup.py:280``)
* hash = sha1(utf8(normalize_for_dedup(line)))[:8] as LE uint64
  (``cc_net/dedup.py:281-292``), carried as signed int64 bit pattern
* two-pass ("drop all copies of anything seen >= 2 times",
  ``cc_net/dedup.py:459-478``) and one-pass keep-first
  (``cc_net/dedup.py:451-456``) both supported
* in-doc keep-first of surviving paragraphs, hash 0 sentinel skipped
  (``cc_net/dedup.py:295-322``)
* bookkeeping: ``original_nlines``/``original_length``/``nlines``/``length``/
  ``line_ids``; docs losing every paragraph vanish (``cc_net/dedup.py:424-425``)

Architecture: the reference's in-RAM FlatHashSet becomes a *hashes
DataFrame* ``(hash long, is_dup boolean)`` built by ``groupBy(hash)``.
The probe is a join (Catalyst/AQE picks broadcast vs sort-merge), the
in-doc keep-first is a window, and doc reassembly is an aggregation over
``struct(line_id, line)`` — everything except the sha1 itself stays JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType

from cc_net_spark.functions.hashing import sha1_u64_series
from cc_net_spark.functions.normalize import normalize_for_dedup_series


# returnType passed as DataType objects (not DDL strings) so the UDFs can be
# defined at import time, before any SparkSession exists.
@pandas_udf(LongType())
def dedup_hash_udf(lines: pd.Series) -> pd.Series:
    """sha1-u64-LE of the dedup-normalized line (Arrow-batched)."""
    return sha1_u64_series(normalize_for_dedup_series(lines))


@pandas_udf(StringType())
def normalize_for_dedup_udf(lines: pd.Series) -> pd.Series:
    return normalize_for_dedup_series(lines)


def explode_paragraphs(df: DataFrame, field: str, id_col: str) -> DataFrame:
    """(id, line_id, line) — one row per paragraph, order preserved by line_id."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(field), "\n")).alias("line_id", "line"),
    )


def paragraph_hashes(df: DataFrame, field: str, id_col: str) -> DataFrame:
    """(id, line_id, line, hash) for every paragraph of every doc."""
    return explode_paragraphs(df, field, id_col).withColumn(
        "hash", dedup_hash_udf(F.col("line"))
    )


def build_hashes(paras: DataFrame) -> DataFrame:
    """Build the dedup hash table: (hash, is_dup).

    ``is_dup`` is true iff the hash occurs >= 2 times corpus-wide — the
    relational form of FlatHashSet's "value=1 iff added twice"
    (``cc_net/flat_hash_set.py:53-62``). Partial aggregation (map-side
    combine) makes this a single shuffle of pre-reduced (hash, count) pairs.
    """
    return paras.groupBy("hash").agg((F.count(F.lit(1)) >= 2).alias("is_dup"))


def merge_hashes(h1: DataFrame, h2: DataFrame) -> DataFrame:
    """Union two hash tables: present in both => dup (``cc_net/dedup.py:92-113``)."""
    return (
        h1.unionByName(h2)
        .groupBy("hash")
        .agg(((F.count(F.lit(1)) >= 2) | F.max("is_dup")).alias("is_dup"))
    )


def _reassemble(
    docs: DataFrame, kept: DataFrame, field: str, id_col: str
) -> DataFrame:
    """Rebuild docs from surviving paragraphs, with reference bookkeeping.

    ``kept`` must have (id_col, line_id, line). Docs with no surviving
    paragraph are dropped by the inner join (``cc_net/dedup.py:424-425``).
    """
    regrouped = kept.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("line_id", "line"))).alias("_parts")
    )
    rebuilt = regrouped.select(
        F.col(id_col),
        F.array_join(F.col("_parts.line"), "\n").alias("_new_text"),
        F.col("_parts.line_id").alias("line_ids"),
    )
    # original_* come from pre-existing nlines/length if the docs carry them,
    # and are never overwritten on re-runs (``cc_net/dedup.py:299-302``);
    # both are materialized on the docs side *before* the join to avoid
    # column ambiguity with the rebuilt side.
    if "original_nlines" not in docs.columns:
        src = F.col("nlines") if "nlines" in docs.columns else F.size(F.split(F.col(field), "\n"))
        docs = docs.withColumn("original_nlines", src)
    if "original_length" not in docs.columns:
        src = F.col("length") if "length" in docs.columns else F.length(F.col(field))
        docs = docs.withColumn("original_length", src)
    # On a re-run, positions must be mapped through the previous run's
    # line_ids so they keep indexing the *original* doc
    # (``cc_net/dedup.py:308-311``).
    had_line_ids = "line_ids" in docs.columns
    if had_line_ids:
        docs = docs.withColumnRenamed("line_ids", "_old_line_ids")
    prepared = docs.drop("nlines", "length")
    out = prepared.join(rebuilt, id_col, "inner")
    if had_line_ids:
        out = out.withColumn(
            "line_ids",
            F.transform(F.col("line_ids"), lambda i: F.element_at("_old_line_ids", i + 1)),
        ).drop("_old_line_ids")
    return (
        out.withColumn(field, F.col("_new_text"))
        .withColumn("nlines", F.size("line_ids"))
        .withColumn("length", F.length("_new_text"))
        .drop("_new_text")
    )


def remove_duplicates(
    docs: DataFrame,
    hashes: DataFrame,
    field: str = "raw_content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Probe side (DuplicatesRemover, ``cc_net/dedup.py:371-432``).

    Drops every copy of any paragraph flagged ``is_dup`` in ``hashes``,
    then keeps the first in-doc occurrence of each surviving hash
    (``finalize_doc``). Paragraphs hashing to the 0 sentinel are dropped
    for parity with ``cc_net/dedup.py:312``.

    The join broadcast-vs-shuffle choice is left to Catalyst/AQE: a small
    hashes table broadcasts (the analogue of the reference loading hash
    files into every worker's RAM), a big one becomes a shuffle join with
    no RAM ceiling.
    """
    paras = paragraph_hashes(docs, field, id_col)
    dup_hashes = hashes.filter(F.col("is_dup")).select("hash")
    survivors = paras.join(dup_hashes, "hash", "left_anti").filter(F.col("hash") != 0)
    w = Window.partitionBy(id_col, "hash").orderBy("line_id")
    kept = (
        survivors.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "line_id", "line")
    )
    return _reassemble(docs, kept, field, id_col)


def deduplicate_two_pass(
    docs: DataFrame, field: str = "raw_content", id_col: str = "doc_id"
) -> DataFrame:
    """Build + probe in one call (``cc_net/dedup.py:459-478``): every copy of
    any paragraph occurring >= 2 times corpus-wide is removed.

    Fused shape (round 6): the generic ``build_hashes`` + ``remove_
    duplicates`` composition scans + normalizes + sha1-hashes the corpus
    TWICE (once per side of the build/probe join) and then runs an
    in-doc keep-first window that is provably a no-op here — a surviving
    hash has corpus-wide count 1, so each (doc, hash) group is a single
    row. One window count over ``hash`` computes the same survivor set
    from ONE paragraph-hash pass with ONE exchange (the reassembly
    groupBy is the only other shuffle). Output is row-identical to the
    old composition (asserted by ``tests/test_dedup.py``); callers with
    an EXTERNAL hash table still use ``remove_duplicates``, where the
    keep-first window is genuinely needed."""
    paras = paragraph_hashes(docs, field, id_col)
    w = Window.partitionBy("hash")
    kept = (
        paras.withColumn("_cnt", F.count(F.lit(1)).over(w))
        .filter((F.col("_cnt") == 1) & (F.col("hash") != 0))
        .select(id_col, "line_id", "line")
    )
    return _reassemble(docs, kept, field, id_col)


def deduplicate_keep_first(
    docs: DataFrame,
    field: str = "raw_content",
    id_col: str = "doc_id",
    order_col: str | None = None,
) -> DataFrame:
    """One-pass semantics (``cc_net/dedup.py:451-456``): keep the globally
    first occurrence of every paragraph, in (order_col, line_id) order.

    The reference's "first" is stream order; here it is made explicit and
    deterministic via ``order_col`` (defaults to ``id_col``).
    """
    order_col = order_col or id_col
    paras = paragraph_hashes(docs, field, id_col).filter(F.col("hash") != 0)
    w = Window.partitionBy("hash").orderBy(order_col, "line_id")
    kept = (
        paras.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "line_id", "line")
    )
    return _reassemble(docs, kept, field, id_col)


def dedup_metrics(docs: DataFrame, deduped: DataFrame, id_col: str = "doc_id") -> dict:
    """Selectivity counters mirroring DuplicatesRemover.summary()
    (``cc_net/dedup.py:434-448``)."""
    n_docs = docs.count()
    row = deduped.agg(
        F.count(F.lit(1)).alias("docs_kept"),
        F.sum("original_nlines").alias("lines_in_kept_docs"),
        F.sum("nlines").alias("lines_kept"),
        F.sum("original_length").alias("chars_in_kept_docs"),
        F.sum("length").alias("chars_kept"),
    ).collect()[0]
    d = row.asDict()
    d["docs_in"] = n_docs
    d["line_selectivity"] = (
        (d["lines_kept"] or 0) / d["lines_in_kept_docs"] if d["lines_in_kept_docs"] else 0.0
    )
    return d
