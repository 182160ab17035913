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
    if/elif). With ``broadcast`` (default) both probe sides ship as
    broadcast hash joins — the right shape when the lookup is a dim
    table and the docs side is the 100 TB corpus."""
    l1 = lookup.select(F.col(key).alias(primary), F.col(value).alias("_v1"))
    l2 = lookup.select(F.col(key).alias(fallback), F.col(value).alias("_v2"))
    if broadcast:
        l1, l2 = F.broadcast(l1), F.broadcast(l2)
    out = (
        docs.join(l1, primary, "left")
        .join(l2, fallback, "left")
        .withColumn(value, F.coalesce("_v1", "_v2"))
        .drop("_v1", "_v2")
    )
    if not keep_unmatched:
        out = out.filter(F.col(value).isNotNull())
    return out
