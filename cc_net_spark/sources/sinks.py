"""Sinks (SURVEY.md §2.2) — thin, opinionated wrappers over ``df.write``.

The reference's sink zoo (size-capped ``MultiFile``, ``?``-sharded
patterns, blocked gzip + index, ``jsonql.split`` per-field routing,
``regroup`` 4 GB bin-packing — ``cc_net/jsonql.py:699-745,979-1078``,
``cc_net/regroup.py``) collapses onto three Spark primitives:

* JSONL out            -> ``write.json`` (+ gzip codec)
* size-capped shards   -> ``maxRecordsPerFile`` (+ AQE-coalesced partitions)
* per-field routing    -> ``write.partitionBy`` (exactly ``split_by_lang``)
* random-access format -> Parquet row groups (free)
* regroup/compaction   -> ``coalesce``/rewrite (Iceberg: rewrite_data_files)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    max_records_per_file: int = 0,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    *,
    fmt: str = "parquet",
    max_records_per_file: int = 0,
    mode: str = "overwrite",
) -> None:
    """``jsonql.split`` / ``split_by_lang`` (``cc_net/mine.py:423-424``):
    route rows into per-key output directories."""
    w = df.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.format(fmt).save(path)


def regroup(df: DataFrame, path: str, *, target_files: int, fmt: str = "parquet") -> None:
    """Shard compaction (``cc_net/regroup.py:62-118``): rewrite into
    ~target_files outputs. On Iceberg this is ``rewrite_data_files``."""
    df.coalesce(target_files).write.mode("overwrite").format(fmt).save(path)


def regroup_by_size(
    spark,
    src_path: str,
    dst_path: str,
    *,
    target_bytes: int = 4 << 30,
    fmt: str = "parquet",
) -> int:
    """Size-targeted compaction — the reference's 4 GB bin-packing
    (``cc_net/regroup.py:62-118``, ``fast_reshard`` target size) expressed
    as: measure the source bytes from file metadata (no data read),
    rewrite into ceil(total/target) files. Returns the file count."""
    import math
    from pathlib import Path

    # DATA bytes only: commit sidecars (_SUCCESS, .crc, _metadata) must
    # not inflate the bin-packing estimate
    total = sum(
        f.stat().st_size
        for f in Path(src_path).rglob("*")
        if f.is_file() and not f.name.startswith(("_", ".")) and not f.name.endswith(".crc")
    )
    n_files = max(1, math.ceil(total / target_bytes))
    df = spark.read.format(fmt).load(src_path)
    # coalesce when shrinking the file count (no shuffle; parquet input
    # splits are size-balanced), repartition when growing
    n_input = len(df.inputFiles())
    writer = df.coalesce(n_files) if n_files <= n_input else df.repartition(n_files)
    writer.write.mode("overwrite").format(fmt).save(dst_path)
    return n_files
