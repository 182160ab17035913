"""Text-analysis operators for a training-data pipeline: language-ID
heuristic, quality scoring, token counting, document fingerprinting.

These fill the reference's LID/LM-scoring slots (``cc_net/split_by_lang.py``,
``cc_net/perplexity.py``) with model-free, JVM-side expressions: everything
here is built from ``pyspark.sql.functions`` (whole-stage codegen) — no
Python in the hot path at all. The per-language stopword lists play the
role of fastText (``split_by_lang.py:52-135``); the length/ratio features
play the role of the KenLM perplexity score (``perplexity.py:135-253``);
the percentile bucketing mirrors ``PerplexityBucket``
(``perplexity.py:256-288``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# compact, disjoint-ish stopword marker sets (top function words per language)
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"],
    "es": ["el", "los", "las", "es", "una", "en", "que", "por", "con", "para"],
    "it": ["il", "gli", "che", "non", "una", "per", "sono", "con", "del", "si"],
}

TOKEN_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"  # BPE-ish word/number/punct split


def _words(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword hit count (the LID signal)."""
    words = _words(text)
    return {
        lang: F.size(F.filter(words, lambda w: w.isin(*sw)))
        for lang, sw in STOPWORDS.items()
    }


def language_id(df: DataFrame, text_col: str, out_col: str = "lang_pred") -> DataFrame:
    """argmax-by-stopword-count language ID; deterministic tie-break by
    language code ('und' if no stopword matched at all)."""
    scores = lang_scores(F.col(text_col))
    # build a sortable array of (score, lang) structs; max = last after sort
    pairs = F.array(
        *[
            F.struct(c.alias("score"), F.lit(lang).alias("lang"))
            for lang, c in sorted(scores.items(), reverse=True)
        ]
    )
    best = F.array_max(pairs)
    pred = F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.withColumn(out_col, pred)


def lid_topk_expr(text: Column, *, k: int = 5, rounding: int = 2) -> Column:
    """Top-k language map ``{lang: score}`` — parity with the reference's
    ``Classifier(top=5, rounding=2)`` output shape
    (``cc_net/split_by_lang.py:52-112``): scores rounded to ``rounding``
    decimals, entries ranked by score desc then lang asc (the fallback's
    deterministic tie-break; fastText probabilities never tie).

    Pure JVM expressions (codegen): stopword hit-rate per language,
    ranked via sort_array on (1 - score, lang) structs. Null text scores
    as empty text."""
    t = F.coalesce(text, F.lit(""))
    words = _words(t)
    n = F.size(words)
    entries = F.array(
        *[
            F.struct(
                (
                    F.size(F.filter(words, lambda w: w.isin(*sw))).cast("double") / n
                ).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, sw in STOPWORDS.items()
        ]
    )
    # sort key (1 - score, lang): ascending sort = score desc, lang asc
    # (1 - s instead of -s dodges the -0.0 ordering corner)
    ranked = F.sort_array(
        F.transform(
            entries,
            lambda e: F.struct(
                (F.lit(1.0) - e["score"]).alias("_inv"),
                e["lang"].alias("lang"),
                e["score"].alias("score"),
            ),
        )
    )
    top = F.slice(ranked, 1, k)
    return F.map_from_entries(
        F.transform(
            top,
            lambda e: F.struct(
                e["lang"].alias("key"),
                F.round(e["score"], rounding).alias("value"),
            ),
        )
    )


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Length / punctuation / stopword-ratio features (model-free quality
    scoring — the perplexity stand-in)."""
    t = F.col(text_col)
    words = _words(t)
    n_words = F.size(words)
    n_chars = F.length(t)
    en_sw = STOPWORDS["en"]
    sw_hits = F.size(F.filter(words, lambda w: w.isin(*en_sw)))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    return (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("n_words", n_words)
        .withColumn(
            "mean_word_len",
            F.round(
                F.when(n_words > 0, (F.length(F.array_join(words, ""))).cast("double") / n_words)
                .otherwise(F.lit(0.0)),
                6,
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.round(
                F.when(n_words > 0, sw_hits.cast("double") / n_words).otherwise(F.lit(0.0)), 6
            ),
        )
        .withColumn(
            "punct_ratio",
            F.round(
                F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0)), 6
            ),
        )
        .withColumn(
            "digit_ratio",
            F.round(
                F.when(n_chars > 0, n_digit.cast("double") / n_chars).otherwise(F.lit(0.0)), 6
            ),
        )
        .withColumn(
            "upper_ratio",
            F.round(
                F.when(n_chars > 0, n_upper.cast("double") / n_chars).otherwise(F.lit(0.0)), 6
            ),
        )
    )


def token_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count + distinct words."""
    t = F.col(text_col)
    words = _words(t)
    return (
        df.withColumn("ws_tokens", F.size(words))
        .withColumn("regex_tokens", F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), 0)))
        .withColumn("distinct_tokens", F.size(F.array_distinct(words)))
    )


def fingerprint(df: DataFrame, text_col: str, out_col: str = "fp") -> DataFrame:
    """Deterministic document fingerprint: md5 hex of the
    whitespace-canonicalized lowercase text (portable across engines)."""
    canon = F.array_join(_words(F.col(text_col)), " ")
    return df.withColumn(out_col, F.md5(canon))


# sentence splitting: RE2-compatible pattern (works in both Spark and
# DuckDB for the oracle) — a sentence is a maximal run without terminal
# punctuation, plus its trailing .!? run. The reference uses the
# sentence_splitter package (``cc_net/tools/expand_corpus.py:95-104``);
# that backend slots in via ``splitter=`` when the package exists.
SENTENCE_REGEX = r"[^.!?]+[.!?]*"


def extract_sentences(
    df: DataFrame, text_col: str, id_col: str, *, splitter: str = "regex"
) -> DataFrame:
    """(id, line_id, sent_id, sentence): line-split then sentence-split
    (reference ``ExtractSentences.do``, ``tools/expand_corpus.py:98-104``).
    JVM-side regex by default; pass splitter="sentence_splitter" to use
    the real package (import-gated) through a pandas UDF."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_id", "_line"),
    )
    if splitter == "sentence_splitter":
        return _split_with_package(lines, id_col)
    sents = lines.select(
        id_col,
        "line_id",
        F.posexplode(
            F.regexp_extract_all(F.col("_line"), F.lit(SENTENCE_REGEX), 0)
        ).alias("sent_id", "sentence"),
    )
    return sents.withColumn("sentence", F.trim("sentence")).filter(
        F.length("sentence") > 0
    )


def _split_with_package(lines: DataFrame, id_col: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sentence_splitter import SentenceSplitter  # import-gated backend

        sp = SentenceSplitter("en")
        for pdf in batches:
            ids, lids, sids, sents = [], [], [], []
            for i, lid, line in zip(pdf[id_col], pdf["line_id"], pdf["_line"]):
                for k, s in enumerate(sp.split(text=line or "")):
                    s = s.strip()
                    if s:
                        ids.append(i), lids.append(lid), sids.append(k), sents.append(s)
            yield pd.DataFrame(
                {id_col: ids, "line_id": lids, "sent_id": sids, "sentence": sents}
            )

    # preserve the caller's id type (string clip ids, long doc ids, ...)
    id_type = dict(lines.dtypes)[id_col]
    return lines.mapInPandas(
        split, schema=f"{id_col} {id_type}, line_id int, sent_id int, sentence string"
    )


def unique_sentences(
    df: DataFrame, text_col: str, id_col: str, *, splitter: str = "regex"
) -> DataFrame:
    """Corpus-wide sentence dedup, keep-first by (id, line_id, sent_id) —
    the distributed form of the reference's in-RAM ``hashes: Set[int]``
    (``tools/expand_corpus.py:105-113``; its str_hash set is an
    implementation of exact-string dedup, expressed here as a window)."""
    sents = extract_sentences(df, text_col, id_col, splitter=splitter)
    w = Window.partitionBy("sentence").orderBy(id_col, "line_id", "sent_id")
    return (
        sents.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("sentence", id_col, "line_id", "sent_id")
    )


def percentile_bucket(
    df: DataFrame,
    value_col: str,
    *,
    head_pct: float = 0.30,
    tail_pct: float = 0.60,
    out_col: str = "bucket",
) -> DataFrame:
    """head/middle/tail bucketing by global percentile cutoffs — the shape
    of PerplexityBucket (``cc_net/perplexity.py:256-288``) with computed
    cutoffs instead of a shipped CSV. Two-pass: one tiny agg (broadcast
    scalar), one map."""
    cuts = df.agg(
        F.percentile_approx(value_col, head_pct, 100_000).alias("c_head"),
        F.percentile_approx(value_col, tail_pct, 100_000).alias("c_tail"),
    ).collect()[0]
    v = F.col(value_col)
    bucket = (
        F.when(v <= cuts["c_head"], F.lit("head"))
        .when(v <= cuts["c_tail"], F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return df.withColumn(out_col, bucket)
