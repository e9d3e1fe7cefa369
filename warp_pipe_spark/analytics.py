"""Event-time analytics over the `events` stream table — the windowed
surface the reference lacks (SURVEY.md §2.8 marks watermarks/windows
"absent") but Structured Streaming gives natively; exposed both as
batch queries (oracle-checkable) and as a streaming aggregation.

Scale: tumbling windows are a keyed aggregation (partial agg map-side);
sessionization is one shuffle keyed by user with an in-partition scan —
the canonical shapes that hold at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour counts/sums per event_type.

    Output: (event_type, hour_ms, n_events, sum_value_cents)."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value") * 100, 0).cast("long").alias("sum_value_cents"),
        )
        .select(
            "event_type",
            F.unix_millis(F.col("w.start")).alias("hour_ms"),
            "n_events",
            "sum_value_cents",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the
    time since the previous event exceeds the gap.

    Output: (user_id, session_seq, n_events, start_ms, end_ms).
    One shuffle keyed by user_id; the lag/cumsum runs inside each
    partition."""
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_ms = gap_minutes * 60 * 1000
    with_breaks = events.withColumn(
        "_new_session",
        F.when(
            F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w)) > gap_ms,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    ).withColumn(
        "session_seq",
        F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_breaks.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.unix_millis("ts")).alias("start_ms"),
            F.max(F.unix_millis("ts")).alias("end_ms"),
        )
    )


def streaming_hourly(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming form of hourly_rollup with late-data handling: the
    watermark bounds state (windows older than max(event_time) -
    watermark are finalized and evicted)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "event_type",
            F.col("w.start").alias("window_start"),
            "n_events",
        )
    )
