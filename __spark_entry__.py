"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementations live in ``cc_net_spark.queries``; each Spark query runs
the engine's real operators (sha1-u64 hashing, window dedup, LSH, CC,
rolling-hash substring pass, brute-force/LSH ANN, audio decode) while the
oracle re-derives the same result relationally in DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cc_net_spark import queries as Q

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: two-pass exact paragraph dedup + duplicate clustering over
    the sf0.001 documents table (the cc_net pipeline's core, Spark-native)."""
    return Q.q_cc_clusters(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q, _ = Q.registry()
    return q


def oracle_sql() -> dict[str, str]:
    _, o = Q.registry()
    return o
