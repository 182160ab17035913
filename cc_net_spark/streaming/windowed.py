"""Watermarked windowed aggregation over an event stream.

``readStream -> withWatermark -> window groupBy -> writeStream`` — the
canonical Structured Streaming shape for event-time aggregation with
bounded state: late rows beyond the watermark are DROPPED (state for a
window is finalized and freed once the watermark passes its end), which
is what makes the operator runnable over an unbounded 100 TB/day stream.

Batch twin: ``q_events_hourly`` computes the same windows over the static
events table (driver-oracled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(window_start, key, n, sum_value) — works on both a static and a
    streaming DataFrame; on a stream, append-mode output emits each
    window once, after the watermark passes it."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), key_col, "n", "sum_value")
    )


def run_windowed_stream(
    spark,
    input_path: str,
    schema: str,
    output_path: str,
    checkpoint_path: str,
    **kwargs,
):
    """File-source stream -> windowed counts -> parquet sink, AvailableNow
    (resumable batch-over-stream, same code as a 24/7 job)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(input_path)
    )
    out = windowed_counts(stream, **kwargs)
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
