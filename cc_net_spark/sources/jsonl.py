"""JSONL / typed-TSV / WET-style sources (SURVEY.md §2.1/§2.3).

Spark-native replacements for the reference's readers:

* ``read_jsonl`` — lenient line-wise JSON (``cc_net/jsonql.py:482-562``
  ``JsonReader``: skip blanks, tolerate malformed lines, count them).
  Maps to ``spark.read.json`` in PERMISSIVE mode with a
  ``_corrupt_record`` column; the malformed count is surfaced instead of
  logged (the reference logs <= 10 examples then drops).
* ``read_typed_tsv`` — the ``jsonql.merge`` TSV format
  (``cc_net/jsonql.py:652-696``): header names carry ``%f/%i/%b/%s`` type
  suffixes; a ``_`` column holds embedded JSON to splice into the row.
* ``parse_wet`` — WARC/WET conversion-record grouping
  (``cc_net/process_wet_file.py:57-141``): header block then body until
  the next ``WARC/1.0`` sentinel; drops non-``conversion`` records and
  docs shorter than ``min_len``; first body line becomes the title.
  Implemented per-file inside ``mapInPandas`` over whole-file contents
  (WET records cannot be split mid-record, so files are the split unit —
  exactly the reference's sharding model).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Lenient JSONL read -> (clean_df, metrics_df with n_lines/n_corrupt).

    ONE parse definition: PERMISSIVE mode keeps malformed lines as rows
    with ``_corrupt_record`` set; metrics come from one aggregation over
    it and the clean rows are the corrupt-null filter of the same frame.
    (Round 1 parsed the input through TWO different readers — text count
    + DROPMALFORMED count.) The frame is deliberately NOT cached: pinning
    a 100 TB parse in executor memory for the application lifetime is
    worse than the consumer's one extra scan; for a true single scan at
    scale, attach ``observe()`` metrics to the downstream write instead.
    """
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", _CORRUPT
    )
    if schema is not None:
        if isinstance(schema, str):
            schema = StructType.fromDDL(schema)
        schema = StructType([*schema.fields, StructField(_CORRUPT, StringType())])
        reader = reader.schema(schema)
    raw = reader.json(path)
    if _CORRUPT not in raw.columns:  # inferred schema, zero corrupt lines
        n = raw.count()
        return raw, spark.createDataFrame([(n, 0)], "n_lines long, n_corrupt long")
    # Spark disallows referencing ONLY _corrupt_record on an uncached raw
    # JSON scan — cache just for the metrics aggregation, then release
    # (never pin a 100 TB parse for the application lifetime)
    raw = raw.cache()
    try:
        row = raw.agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col(_CORRUPT).isNotNull().cast("long")).alias("n_corrupt"),
        ).collect()[0]
    finally:
        raw.unpersist()
    metrics = spark.createDataFrame(
        [(row["n_lines"], row["n_corrupt"] or 0)], "n_lines long, n_corrupt long"
    )
    clean = raw.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    return clean, metrics


_TSV_TYPES = {
    "f": DoubleType(),
    "i": LongType(),
    "b": BooleanType(),
    "s": StringType(),
}


def read_typed_tsv(spark: SparkSession, path: str, separator: str = "\t") -> DataFrame:
    """TSV with ``name%t`` typed headers; a ``_`` column of embedded JSON is
    spliced into the top level (the reference merges it into the doc dict,
    ``cc_net/jsonql.py:677-683``)."""
    raw = spark.read.option("sep", separator).option("header", True).csv(path)
    splice_json = None
    out_cols = []
    for name in raw.columns:
        if name == "_":
            splice_json = F.col("_")
            continue
        base, _, suffix = name.partition("%")
        typ = _TSV_TYPES.get(suffix or "s", StringType())
        out_cols.append(F.col(f"`{name}`").cast(typ).alias(base))
    df = raw.select(*out_cols, *( [splice_json.alias("_json")] if splice_json is not None else [] ))
    if splice_json is not None:
        sample = [r["_json"] for r in df.select("_json").filter(F.col("_json").isNotNull()).take(20)]
        inferred = spark.read.json(spark.sparkContext.parallelize(sample)).schema if sample else None
        if inferred:
            df = df.withColumn("_parsed", F.from_json("_json", inferred))
            for f_ in inferred.fields:
                df = df.withColumn(f_.name, F.col(f"_parsed.{f_.name}"))
        df = df.drop("_json", "_parsed")
    return df


WET_SCHEMA = (
    "url string, date_download string, digest string, length long, "
    "source_file string, title string, raw_content string, nlines int"
)


def _parse_wet_text(name: str, content: str, min_len: int) -> list[tuple]:
    docs = []
    records = content.split("WARC/1.0")
    for rec in records:
        if not rec.strip():
            continue
        head, _, body = rec.partition("\n\n")
        headers = {}
        for line in head.splitlines():
            k, _, v = line.partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        if headers.get("warc-type") != "conversion":
            continue
        body = body.strip("\n")
        lines = body.split("\n") if body else []
        raw = "\n".join(lines[1:]) if len(lines) > 1 else ""
        if len(raw) < min_len:
            continue
        docs.append(
            (
                headers.get("warc-target-uri", ""),
                headers.get("warc-date", ""),
                headers.get("warc-block-digest", ""),
                int(headers.get("content-length", "0") or 0),
                name,
                lines[0] if lines else "",
                raw,
                max(0, len(lines) - 1),
            )
        )
    return docs


def parse_wet(spark: SparkSession, path_glob: str, min_len: int = 300) -> DataFrame:
    """WET files -> documents DataFrame; one task per file (records are not
    line-splittable, mirroring the reference's per-segment sharding)."""
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "url", "date_download", "digest", "length",
            "source_file", "title", "raw_content", "nlines",
        ]
        for pdf in batches:
            rows = []
            for name, blob in zip(pdf["path"], pdf["content"]):
                rows.extend(_parse_wet_text(name, bytes(blob).decode("utf-8", "replace"), min_len))
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(parse, schema=WET_SCHEMA)
