"""Sessionization — gap-based event sessions, batch and streaming.

The reference has no event-stream notion; this is engine-native coverage
for the training-data-pipeline workload (activity sessions over an
events table at 100 TB):

* ``sessionize`` (batch): pure window functions — lag -> gap flag ->
  running session index per user, one shuffle on user_id. SQL-expressible,
  so it is driver-oracled (query ``user_sessions``).
* ``sessionize_stream``: the same semantics as a custom STATEFUL
  streaming operator via ``applyInPandasWithState`` — per-user state
  carries (current session start, last ts, count, value sum); a session
  is emitted when the idle gap exceeds ``gap`` (event time) or the
  watermark times the state out. This is the Spark-native shape for
  custom stateful operators the north rule's streaming row asks about.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    event_id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """(user, session_id, session_start, session_end, n_events,
    sum_value): gap-based sessions; a new session starts when the gap
    from the previous event of the same user exceeds ``gap_minutes``.
    ``event_id_col`` breaks same-timestamp ties deterministically;
    ``value_col`` is the summed measure."""
    w = Window.partitionBy(user_col).orderBy(ts_col, event_id_col)
    gap_s = int(gap_minutes * 60)
    prev_ts = F.lag(ts_col).over(w)
    new_session = (
        prev_ts.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts) > gap_s)
    ).cast("int")
    with_idx = events.withColumn("_new", new_session).withColumn(
        "session_id", F.sum("_new").over(w)
    )
    return (
        with_idx.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            user_col,
            F.col("session_id").cast("long").alias("session_id"),
            "session_start",
            "session_end",
            "n_events",
            "sum_value",
        )
    )


def sessionize_stream(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    watermark: str = "1 hour",
    value_col: str = "value",
):
    """Stateful-streaming sessionization: ``applyInPandasWithState`` over
    a watermarked event stream; one state object per user. Emits a row
    per CLOSED session (closed by a later event past the gap, or by
    state timeout once the watermark passes).

    Guarantee: exact parity with the batch ``sessionize`` whenever each
    user's events arrive in event-time order across micro-batches (any
    within-batch disorder is sorted out). A LATE event (older than the
    user's current session end but inside the watermark) merges into the
    open session — state keeps only aggregates, so re-splitting history
    would require buffering raw events until the watermark; the bounded
    approximation never corrupts the session span.

    Returns the transformed streaming DataFrame (caller starts the query).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    # the output key field inherits the input's user column type (a
    # hardcoded LongType would throw for string-keyed event schemas)
    user_type = events.schema[user_col].dataType
    out_schema = StructType(
        [
            StructField(user_col, user_type),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("last_us", LongType()),
            StructField("n", LongType()),
            StructField("sv", DoubleType()),
        ]
    )
    gap_us = int(gap_minutes * 60 * 1_000_000)

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        (user,) = key
        rows = []
        if state.exists:
            start_us, last_us, n, sv = state.get
        else:
            start_us = last_us = n = 0
            sv = 0.0
        if state.hasTimedOut:
            if n:
                rows.append((user, start_us, last_us, n, sv))
            state.remove()
        else:
            ts_list = []
            vals = []
            for pdf in pdfs:
                ts_list.extend(int(t.value) // 1000 for t in pd.to_datetime(pdf[ts_col]))
                vals.extend(float(v) for v in pdf[value_col])
            order = sorted(range(len(ts_list)), key=lambda i: ts_list[i])
            for i in order:
                t_us, v = ts_list[i], vals[i]
                if n and t_us <= last_us:
                    # late event (prior micro-batch advanced last_us, the
                    # watermark still admits this ts): merge into the open
                    # session without rewinding its end — rewinding would
                    # corrupt the span and trigger false gap splits on the
                    # next in-order event
                    start_us = min(start_us, t_us)
                    n += 1
                    sv += v
                    continue
                if n and t_us - last_us > gap_us:
                    rows.append((user, start_us, last_us, n, sv))
                    start_us, n, sv = t_us, 0, 0.0
                if not n:
                    start_us = t_us
                last_us = t_us
                n += 1
                sv += v
            timeout_ms = last_us // 1000 + gap_us // 1000
            wm_ms = state.getCurrentWatermarkMs()
            if timeout_ms <= wm_ms:
                # the watermark already passed this session's idle gap
                # (late-arriving group): close it now — a timeout in the
                # past is invalid to register
                rows.append((user, start_us, last_us, n, sv))
                state.remove()
            else:
                state.update((start_us, last_us, n, sv))
                state.setTimeoutTimestamp(timeout_ms)
        out = pd.DataFrame(
            rows, columns=[user_col, "start_us", "last_us", "n_events", "sum_value"]
        )
        out["session_start"] = pd.to_datetime(out.pop("start_us"), unit="us")
        out["session_end"] = pd.to_datetime(out.pop("last_us"), unit="us")
        yield out[[user_col, "session_start", "session_end", "n_events", "sum_value"]]

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
