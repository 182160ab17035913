"""Minify / unminify — metadata projection + reconstruction join
(SURVEY.md §2.3/§2.5; reference ``cc_net/minify.py``).

``minify`` projects a processed doc down to its identifying metadata plus
``line_ids`` (which paragraphs of the ORIGINAL doc survived dedup) —
the reference packs line_ids as base64 ``<u2`` (``cc_net/minify.py:62-69``,
implying <= 65,535 lines/doc); we keep a native ``array<int>`` since
Parquet stores it compactly.

``unminify`` is the reference's ``MetadataFetcher`` join
(``cc_net/minify.py:101-211``): metadata ⋈ original docs on the id, then
gather paragraphs by ``line_ids`` to rebuild the deduped content. The
reference requires co-ordered per-segment iteration; here it is a plain
join — co-location comes from bucketed/partitioned storage, and
Catalyst/AQE picks broadcast vs shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MINIFY_COLUMNS = ["language", "language_score", "perplexity", "bucket", "cc_segment"]


def minify(
    deduped: DataFrame,
    id_col: str = "doc_id",
    keep: list[str] | None = None,
) -> DataFrame:
    """Project to id + line_ids + whichever metadata columns exist, with the
    reference's rounding (pp -> 1dp, score -> 2dp, ``cc_net/minify.py:91-97``)."""
    cols = [F.col(id_col), F.col("line_ids")]
    present = set(deduped.columns)
    for c in keep if keep is not None else MINIFY_COLUMNS:
        if c not in present:
            continue
        if c == "perplexity":
            cols.append(F.round(F.col(c), 1).alias(c))
        elif c == "language_score":
            cols.append(F.round(F.col(c), 2).alias(c))
        else:
            cols.append(F.col(c))
    return deduped.select(*cols)


def unminify(
    meta: DataFrame,
    originals: DataFrame,
    field: str = "raw_content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rebuild deduped content: meta ⋈ originals, then gather the original
    paragraphs at ``line_ids`` (``cc_net/minify.py:173-195``)."""
    orig = originals.select(F.col(id_col), F.split(F.col(field), "\n").alias("_lines"))
    joined = meta.join(orig, id_col, "inner")
    gathered = F.transform(F.col("line_ids"), lambda i: F.element_at("_lines", i + 1))
    return (
        joined.withColumn(field, F.array_join(gathered, "\n"))
        .withColumn("nlines", F.size("line_ids"))
        .withColumn("length", F.length(field))
        .drop("_lines")
    )
