"""Generic join shapes from the reference's tools tier.

``fallback_join`` is the dmoz corpus join
(``cc_net/tools/make_dmoz_corpus.py:63-93``): a lookup table keyed at
TWO granularities (exact url, then source domain) is probed per doc —
take the value by the primary key if present, else by the fallback key,
else drop the doc. The reference walks a driver-resident dict; here it
is the coalesce of two left joins with the (small) lookup broadcast, so
the corpus side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fallback_join(
    docs: DataFrame,
    lookup: DataFrame,
    *,
    primary: str,
    fallback: str,
    key: str = "key",
    value: str = "tags",
    keep_unmatched: bool = False,
    broadcast: bool = True,
) -> DataFrame:
    """Join ``docs`` to ``lookup[key -> value]`` by ``docs[primary]``,
    falling back to ``docs[fallback]``; unmatched docs are dropped
    unless ``keep_unmatched`` (the reference `continue`s past them).

    The primary match wins even when both keys hit (the reference's
    if/elif), and — like the dict — a matched key whose VALUE is null
    still counts as matched (an explicit ``_hit`` marker carries
    matchedness; coalescing the values alone would conflate "matched
    null" with "unmatched"). Lookup keys are deduplicated per probe side
    (first-by-sort deterministic): the reference's dict cannot hold
    duplicate keys, and a duplicated dim key would otherwise silently
    fan out every matching corpus row. With ``broadcast`` (default)
    both probe sides ship as broadcast hash joins — the right shape
    when the lookup is a dim table and the docs side is the 100 TB
    corpus."""
    from pyspark.sql.window import Window

    def side(alias: str, n: int):
        w = Window.partitionBy(key).orderBy(F.col(value).cast("string"))
        deduped = (
            lookup.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(
                F.col(key).alias(alias),
                F.col(value).alias(f"_v{n}"),
                F.lit(True).alias(f"_hit{n}"),
            )
        )
        return F.broadcast(deduped) if broadcast else deduped

    out = (
        docs.join(side(primary, 1), primary, "left")
        .join(side(fallback, 2), fallback, "left")
        .withColumn(
            value,
            F.when(F.col("_hit1"), F.col("_v1")).otherwise(F.col("_v2")),
        )
    )
    if not keep_unmatched:
        out = out.filter(F.coalesce("_hit1", "_hit2", F.lit(False)))
    return out.drop("_v1", "_v2", "_hit1", "_hit2")
