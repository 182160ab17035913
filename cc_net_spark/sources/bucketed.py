"""Bucketed (co-located) tables — shuffle-free repeated joins.

At 100 TB the dedup probe and the unminify metadata join repeat on the
same key (doc id / hash). Writing both sides bucketed on that key
(`bucketBy` + `sortBy`) pins partitioning into the table layout, so every
subsequent equi-join is Exchange-free: Catalyst sees compatible output
partitioning and skips both shuffles (verified by the plan test —
`test_bucketed_join_has_no_exchange`).

The reference's analogue is its fixed 1600-shard layout keyed by content
hash (``cc_net/jsonql.py:436-447``); bucketing is the Spark-native form
with the optimizer aware of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    *,
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table (spark-warehouse parquet)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
