"""Driver-side Parquet schema resolution — zero-Spark-job table opens.

``spark.read.parquet(path)`` launches a footer-inference job (1 task
locally, a distributed footer scan on a many-file table) before any data
is read. For tables the engine itself manages, the schema is either
recorded (stage manifests — see ``plans/dag.readback_schema_json``) or
derivable from ONE footer read driver-side via pyarrow. This helper does
the latter for external inputs (the clips table): read one footer, map
it to the Spark schema read-back inference would produce, and pass it to
the reader explicitly.

Scope: local filesystem paths (pyarrow footer read). Scheme URIs and any
conversion surprise fall back to plain inference — correctness never
depends on the fast path.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def _one_footer_schema(path: str):
    """Spark StructType from a single Parquet footer, or None."""
    p = Path(path)
    if not p.exists():
        return None
    f = p if p.is_file() else next(iter(sorted(p.rglob("*.parquet"))), None)
    if f is None:
        return None
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    return from_arrow_schema(pq.ParquetFile(f).schema_arrow)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` without the footer-inference job when one
    driver-side footer read can supply the schema (see module doc).

    The fallback (scheme URIs, empty dirs, exotic types) is the plain
    reader — identical results, plus the one inference job."""
    if "://" not in str(path):
        try:
            schema = _one_footer_schema(str(path))
        except Exception:
            schema = None
        if schema is not None:
            return spark.read.schema(schema).parquet(str(path))
    return spark.read.parquet(str(path))
