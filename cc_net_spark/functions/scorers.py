"""Model-scorer slots for the reference's default pipeline path
``lid -> keep_lang -> sp -> lm -> pp_bucket`` (``cc_net/mine.py:36-45``).

The reference's most-used steps are model-backed: fastText LID
(``cc_net/split_by_lang.py:52-135``), SentencePiece tokenization +
KenLM perplexity (``cc_net/perplexity.py:42-253``). Those model
libraries are not available in this environment, so each step here is an
INTERFACE-COMPATIBLE SLOT: a real backend gated behind an import-try
(drop the model file + pip package in and it activates), plus a
deterministic model-free fallback so the pipeline shape is runnable and
testable everywhere.

Every backend is Arrow-batched (pandas UDF / JVM expressions) — no
per-row Python, per the input contract.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cc_net_spark.functions.text import (
    TOKEN_REGEX,
    language_id,
    lang_scores,
    percentile_bucket,
    quality_features,
)


# ---------------------------------------------------------------------------
# LID slot (reference: fastText lid.bin, split_by_lang.py:52-135)
# ---------------------------------------------------------------------------


def fasttext_available() -> bool:
    try:
        import fasttext  # noqa: F401

        return True
    except ImportError:
        return False


def lid(df: DataFrame, text_col: str, *, model_path: str | None = None) -> DataFrame:
    """Adds (lang, lang_score). Backend: fastText when the package and a
    model path are supplied; otherwise the stopword-argmax fallback with
    score = stopword hit rate."""
    if model_path is not None and fasttext_available():
        return _fasttext_lid(df, text_col, model_path)
    out = language_id(df, text_col, out_col="lang")
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    best_hits = F.greatest(*lang_scores(F.col(text_col)).values())
    score = F.when(
        F.size(words) > 0, best_hits.cast("double") / F.size(words)
    ).otherwise(F.lit(0.0))
    return out.withColumn("lang_score", F.round(score, 6))


def _fasttext_lid(df: DataFrame, text_col: str, model_path: str) -> DataFrame:
    """Real backend: fastText predict over Arrow batches, model loaded
    once per python worker (matches ``split_by_lang.py:52-75``)."""
    from collections.abc import Iterator

    import pandas as pd

    fields = ", ".join(f"{c.name} {c.dataType.simpleString()}" for c in df.schema)
    out_schema = f"{fields}, lang string, lang_score double"

    def predict(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import fasttext

        model = fasttext.load_model(model_path)
        for pdf in batches:
            texts = pdf[text_col].fillna("").str.replace("\n", " ").tolist()
            labels, scores = model.predict(texts)
            pdf = pdf.copy()
            pdf["lang"] = [l[0].replace("__label__", "") if l else "und" for l in labels]
            pdf["lang_score"] = [round(float(s[0]), 6) if len(s) else 0.0 for s in scores]
            yield pdf

    return df.mapInPandas(predict, schema=out_schema)


def lid_topk(
    df: DataFrame,
    text_col: str,
    *,
    out_col: str = "lid",
    k: int = 5,
    rounding: int = 2,
    model_path: str | None = None,
) -> DataFrame:
    """Adds a top-k language map column ``{lang: score}`` — the output
    shape of the reference's ``Classifier(top=5, rounding=2)`` used for
    ``lid_before_dedup``/``lid_after_dedup`` (``cc_net/split_by_lang.py:
    52-112``, ``cc_net/mine.py:362-376``). Backend: fastText top-k when
    available; otherwise the stopword hit-rate ranking (JVM expressions,
    deterministic score-desc/lang-asc order)."""
    if model_path is not None and fasttext_available():
        return _fasttext_lid_topk(df, text_col, out_col, k, rounding, model_path)
    from cc_net_spark.functions.text import lid_topk_expr

    return df.withColumn(
        out_col, lid_topk_expr(F.col(text_col), k=k, rounding=rounding)
    )


def _fasttext_lid_topk(
    df: DataFrame, text_col: str, out_col: str, k: int, rounding: int,
    model_path: str,
) -> DataFrame:
    """Real backend: fastText predict(k) over Arrow batches, model loaded
    once per python worker (``split_by_lang.py:81-82,95-96``: newline
    strip, scores rounded to ``rounding``)."""
    from collections.abc import Iterator

    import pandas as pd

    fields = ", ".join(f"{c.name} {c.dataType.simpleString()}" for c in df.schema)
    out_schema = f"{fields}, {out_col} map<string,double>"

    def predict(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import fasttext

        model = fasttext.load_model(model_path)
        for pdf in batches:
            texts = pdf[text_col].fillna("").str.replace("\n", " ").tolist()
            labels, scores = model.predict(texts, k=k)
            pdf = pdf.copy()
            pdf[out_col] = [
                {
                    l.replace("__label__", ""): round(float(s), rounding)
                    for l, s in zip(ls, ss)
                }
                for ls, ss in zip(labels, scores)
            ]
            yield pdf

    return df.mapInPandas(predict, schema=out_schema)


def keep_lang(df: DataFrame, langs: list[str], lang_col: str = "lang") -> DataFrame:
    """``jsonql.where`` keep_lang step (``cc_net/mine.py:38``)."""
    return df.filter(F.col(lang_col).isin(*langs))


# ---------------------------------------------------------------------------
# Tokenizer slot (reference: SentencePiece, perplexity.py:42-97)
# ---------------------------------------------------------------------------


def sentencepiece_available() -> bool:
    try:
        import sentencepiece  # noqa: F401

        return True
    except ImportError:
        return False


def tokenize(
    df: DataFrame, text_col: str, *, model_path: str | None = None,
    out_col: str = "tokenized",
) -> DataFrame:
    """Adds a tokenized text column. Backend: SentencePiece when
    available; fallback: the BPE-ish regex split (JVM-side, codegen)."""
    if model_path is not None and sentencepiece_available():
        return _sp_tokenize(df, text_col, model_path, out_col)
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), 0)
    return df.withColumn(out_col, F.array_join(toks, " "))


def sacremoses_available() -> bool:
    try:
        import sacremoses  # noqa: F401

        return True
    except ImportError:
        return False


def robust_tokenize(
    df: DataFrame, text_col: str, *, lang: str = "en", out_col: str = "tokenized"
) -> DataFrame:
    """``RobustTokenizer`` parity (``cc_net/tokenizer.py:15-32``): the
    EXACT reference preprocessing — ``normalize(accent=lang in {en,my},
    case=False, numbers=False, punct=True)`` then
    ``normalize_spacing_for_tok`` (both byte-parity ports in
    functions/normalize.py) — followed by Moses tokenization when
    sacremoses is importable, else the regex token split. The
    preprocessing is the reference-defined part; only the final Moses
    split is a gated backend."""
    from collections.abc import Iterator

    import pandas as pd

    from cc_net_spark.functions.normalize import (
        normalize as _norm,
        normalize_spacing_for_tok as _spacing,
    )

    rm_accent = lang in ("en", "my")  # RobustTokenizer.LANG_WITHOUT_ACCENT
    use_moses = sacremoses_available()
    fields = ", ".join(f"{c.name} {c.dataType.simpleString()}" for c in df.schema)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        moses = None
        if use_moses:
            import sacremoses

            moses = sacremoses.MosesTokenizer(lang)
        tok_re = re.compile(TOKEN_REGEX)
        for pdf in batches:
            pdf = pdf.copy()
            out = []
            for t in pdf[text_col]:
                t = _norm(
                    t or "", accent=rm_accent, case=False, numbers=False, punct=True
                )
                t = _spacing(t, language=lang)
                if moses is not None:
                    out.append(moses.tokenize(t, return_str=True, escape=False))
                else:
                    out.append(" ".join(tok_re.findall(t)))
            pdf[out_col] = out
            yield pdf

    return df.mapInPandas(encode, schema=f"{fields}, {out_col} string")


def _sp_tokenize(df: DataFrame, text_col: str, model_path: str, out_col: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    fields = ", ".join(f"{c.name} {c.dataType.simpleString()}" for c in df.schema)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sentencepiece as spm

        sp = spm.SentencePieceProcessor(model_file=model_path)
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                " ".join(sp.encode(t or "", out_type=str)) for t in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(encode, schema=f"{fields}, {out_col} string")


# ---------------------------------------------------------------------------
# LM slot (reference: KenLM 5-gram, perplexity.py:100-253)
# ---------------------------------------------------------------------------


def kenlm_available() -> bool:
    try:
        import kenlm  # noqa: F401

        return True
    except ImportError:
        return False


def lm_score(
    df: DataFrame, text_col: str, *, model_path: str | None = None,
    out_col: str = "perplexity",
) -> DataFrame:
    """Adds a doc-level perplexity column (reference rounds to 1dp,
    ``perplexity.py:198``). Backend: KenLM when available; fallback: a
    deterministic length/ratio proxy (higher = weirder text), so
    downstream bucketing keeps the reference's head/middle/tail shape."""
    if model_path is not None and kenlm_available():
        return _kenlm_score(df, text_col, model_path, out_col)
    q = quality_features(df, text_col)
    # proxy: short words, heavy punctuation and digits read as high pp
    proxy = (
        1000.0 / (1.0 + F.col("mean_word_len"))
        + 2000.0 * F.col("punct_ratio")
        + 2000.0 * F.col("digit_ratio")
        - 500.0 * F.col("stopword_ratio")
    )
    keep = [c for c in df.columns]
    return q.select(*keep, F.round(F.greatest(proxy, F.lit(0.0)), 1).alias(out_col))


def _kenlm_score(df: DataFrame, text_col: str, model_path: str, out_col: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    fields = ", ".join(f"{c.name} {c.dataType.simpleString()}" for c in df.schema)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import kenlm

        model = kenlm.Model(model_path)
        for pdf in batches:
            pps = []
            for t in pdf[text_col]:
                # doc pp = 10^(-log10P / words), lines pooled like DocLM
                # (perplexity.py:180-198)
                log_score, words = 0.0, 0
                for line in (t or "").split("\n"):
                    log_score += model.score(line)
                    words += len(line.split()) + 1
                pps.append(round(10.0 ** (-log_score / max(words, 1)), 1))
            pdf = pdf.copy()
            pdf[out_col] = pps
            yield pdf

    return df.mapInPandas(score, schema=f"{fields}, {out_col} double")


# ---------------------------------------------------------------------------
# the composed default path (mine.py:36-45)
# ---------------------------------------------------------------------------


def classify_and_score(
    df: DataFrame,
    text_col: str,
    *,
    langs: list[str] | None = None,
    lid_model: str | None = None,
    sp_model: str | None = None,
    lm_model: str | None = None,
) -> DataFrame:
    """lid -> keep_lang -> sp -> lm -> pp_bucket, each step on its active
    backend. Output adds (lang, lang_score, tokenized, perplexity, bucket)."""
    out = lid(df, text_col, model_path=lid_model)
    if langs:
        out = keep_lang(out, langs)
    out = tokenize(out, text_col, model_path=sp_model)
    out = lm_score(out, "tokenized", model_path=lm_model)
    return percentile_bucket(out, "perplexity")
