"""Substring-overlap pass: find doc pairs sharing a character run of
length >= L (SURVEY.md §7.1 step 7 — "near-verbatim transcript overlap",
the Spark-scalable stand-in for a corpus suffix array à la Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better").

Every stride-1 length-L character window of the normalized text is hashed
with a position-independent rolling polynomial hash (O(n) numpy per doc,
no window strings materialized). Two docs share an L-char substring iff
they share a window hash (collisions ~2^-64). Pipeline shape:

  scan -> mapInPandas (rolling hashes, distinct per doc) ->
  groupBy(gram) bucket join (skew-capped, hot grams dropped with metrics)
  -> candidate pairs [-> exact verification of the actual overlap length].

Stride 1 is exact for overlaps >= L; the gram table is ~len(text) rows per
doc, which shuffles compactly as (long, id) pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cc_net_spark.functions.hashing import window_hashes
from cc_net_spark.functions.normalize import normalize_for_dedup_series
from cc_net_spark.operators.pairs import candidate_pairs


def doc_window_grams(
    df: DataFrame,
    field: str,
    id_col: str,
    *,
    length: int = 50,
    normalize: bool = True,
    winnow_window: int = 0,
) -> DataFrame:
    """(id, gram) — distinct rolling-hash values of all L-char windows.

    With ``winnow_window=w > 1``, only winnowed fingerprints are emitted
    (~2/(w+1) of the grams): detection is then guaranteed for shared runs
    of length >= length + w - 1 instead of >= length — the scale knob that
    cuts the shuffled gram table ~10x (see ``functions.hashing.winnow``).
    """
    from cc_net_spark.functions.hashing import winnow as _winnow

    src = df.select(F.col(id_col).cast("string").alias(id_col), F.col(field))

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = (
                normalize_for_dedup_series(pdf[field])
                if normalize
                else pdf[field].astype("string")
            ).fillna("")
            ids: list = []
            grams: list[np.ndarray] = []
            for i, t in zip(pdf[id_col], texts):
                wh = window_hashes(t, length)
                g = _winnow(wh, winnow_window) if winnow_window > 1 else np.unique(wh)
                if len(g):
                    ids.append((i, len(g)))
                    grams.append(g)
            if not grams:
                yield pd.DataFrame({id_col: pd.Series([], dtype=object), "gram": pd.Series([], dtype="int64")})
                continue
            flat = np.concatenate(grams).view(np.int64)
            rep_ids = np.repeat([i for i, _ in ids], [n for _, n in ids])
            yield pd.DataFrame({id_col: rep_ids, "gram": flat})

    return src.mapInPandas(compute, schema=f"{id_col} string, gram long")


def substring_candidate_pairs(
    df: DataFrame,
    field: str,
    id_col: str,
    *,
    length: int = 50,
    gram_cap: int = 100,
    normalize: bool = True,
    winnow_window: int = 0,
    with_metrics: bool = False,
):
    """Doc pairs sharing at least one length-L character window (or, with
    winnowing, a run of length >= length + winnow_window - 1)."""
    grams = doc_window_grams(
        df, field, id_col, length=length, normalize=normalize, winnow_window=winnow_window
    )
    # (gram, id) is unique by construction: both the winnow and the
    # np.unique path emit distinct gram values per doc
    return candidate_pairs(
        grams, ["gram"], id_col, bucket_cap=gram_cap,
        with_metrics=with_metrics, assume_unique=True,
    )


def _lcs_rolling(x: str, y: str) -> int:
    """LCS length via O((n+m) log n) rolling-hash binary search —
    collision odds ~2^-64 per probe, fully numpy-vectorized."""
    lo, hi = 0, min(len(x), len(y))  # lcs length in (lo, hi]
    while lo < hi:
        mid = (lo + hi + 1) // 2
        ha = window_hashes(x, mid)
        hb = window_hashes(y, mid)
        if len(np.intersect1d(ha, hb, assume_unique=False)):
            lo = mid
        else:
            hi = mid - 1
    return lo


def verify_overlap_length(
    pairs: DataFrame,
    df: DataFrame,
    field: str,
    id_col: str,
    *,
    min_length: int = 50,
    kernel: str = "rolling",
) -> DataFrame:
    """(id_a, id_b, overlap_len) — exact longest-common-substring length
    for candidate pairs, in a vectorized batch UDF. Intended for
    candidate pairs only (tiny input).

    ``kernel="rolling"`` (default): per-pair rolling-hash binary search.
    ``kernel="suffix_array"``: generalized suffix array + Kasai LCP
    (``functions/suffix.py``) — the literal suffix-array kernel of the
    substring-dedup literature, exact with no hash-collision caveat.
    Both kernels are property-tested equal.
    """
    if kernel == "suffix_array":
        from cc_net_spark.functions.suffix import lcs_length as _lcs
    elif kernel == "rolling":
        _lcs = _lcs_rolling
    else:
        raise ValueError(f"unknown kernel {kernel!r}")
    texts = df.select(
        F.col(id_col).cast("string").alias(id_col), F.col(field).alias("_t")
    )
    joined = (
        pairs.join(texts.withColumnRenamed(id_col, "id_a").withColumnRenamed("_t", "_ta"), "id_a")
        .join(texts.withColumnRenamed(id_col, "id_b").withColumnRenamed("_t", "_tb"), "id_b")
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ta = normalize_for_dedup_series(pdf["_ta"]).fillna("")
            tb = normalize_for_dedup_series(pdf["_tb"]).fillna("")
            out = np.fromiter(
                (_lcs(x, y) for x, y in zip(ta, tb)), dtype=np.int64, count=len(pdf)
            )
            yield pd.DataFrame(
                {"id_a": pdf["id_a"], "id_b": pdf["id_b"], "overlap_len": out}
            )

    res = joined.mapInPandas(compute, schema="id_a string, id_b string, overlap_len long")
    return res.filter(F.col("overlap_len") >= min_length)
