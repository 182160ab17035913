"""The reference's MAIN pipeline, end-to-end: ``cc_net mine``.

``cc_net/mine.py:36-45`` declares the default step list
``lid -> keep_lang -> sp -> lm -> pp_bucket -> drop -> split_by_lang``
running after paragraph dedup against the hash files. This module is the
Spark-native composition of the same steps from this repo's operators:

  1. two-pass paragraph dedup        (operators/exact_dedup.py)
  2. language-ID + keep_lang          (functions/scorers.lid — fastText
     when available, stopword fallback)
  3. tokenize + LM score + pp bucket (functions/scorers — SentencePiece/
     KenLM slots, deterministic fallbacks)
  4. drop tail bucket (optional)     (``mine.py`` drops pp > cutoff)
  5. minify                          (operators/minify.py)
  6. split_by_lang                   (sources/sinks.write_partitioned —
     one output directory per (lang, bucket), exactly ``split_by_lang``)

A user of the reference running ``python -m cc_net mine`` gets the same
artifact shape here: cleaned deduped docs routed by language and
perplexity bucket, plus the minified metadata table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cc_net_spark.functions import scorers
from cc_net_spark.operators import exact_dedup as ed
from cc_net_spark.operators.minify import minify
from cc_net_spark.sources.sinks import write_partitioned


def mine(
    spark: SparkSession,
    docs: DataFrame,
    *,
    text_col: str = "raw_content",
    id_col: str = "doc_id",
    langs: list[str] | None = None,
    drop_tail: bool = True,
    lid_model: str | None = None,
    sp_model: str | None = None,
    lm_model: str | None = None,
    output_path: str | None = None,
    lid_maps: bool = True,
) -> dict[str, DataFrame]:
    """Run the default mine pipeline; returns {"docs": cleaned+scored,
    "metadata": minified}. When ``output_path`` is given, docs are also
    written partitioned by (lang, bucket) — the ``split_by_lang`` sink.

    ``lid_maps=True`` adds the reference's top-5 language maps
    ``lid_before_dedup`` (on the raw text) and ``lid_after_dedup`` (on
    the dedup-surviving text) — ``cc_net/mine.py:362-376``."""
    if lid_maps:
        docs = scorers.lid_topk(
            docs, text_col, out_col="lid_before_dedup", model_path=lid_model
        )
    deduped = ed.deduplicate_two_pass(docs, text_col, id_col)
    if lid_maps:
        deduped = scorers.lid_topk(
            deduped, text_col, out_col="lid_after_dedup", model_path=lid_model
        )
    scored = scorers.classify_and_score(
        deduped,
        text_col,
        langs=langs,
        lid_model=lid_model,
        sp_model=sp_model,
        lm_model=lm_model,
    )
    if drop_tail:
        scored = scored.filter(F.col("bucket") != "tail")
    meta = minify(
        scored.withColumnRenamed("lang", "language")
        .withColumnRenamed("lang_score", "language_score"),
        id_col,
    )
    if output_path is not None:
        write_partitioned(
            scored.drop("tokenized"), output_path, ["lang", "bucket"]
        )
    return {"docs": scored, "metadata": meta}
