"""Structured-Streaming-ready event-time operators.

The reference engine is batch-only (SURVEY.md section 2.9: no streaming
anywhere), so these are scale-out extensions, not parity items.  Both
functions are written against the unified DataFrame API: the same code runs
on a batch DataFrame (driver correctness harness, DuckDB oracle) and on a
``readStream`` DataFrame (with the watermark bounding state for late data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window aggregation per event_type.

    On a streaming input the watermark bounds state and handles late data;
    on a batch input it is a plain GROUP BY over the window bucket.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.window("ts", window_duration).alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user (gap-based).  Streaming uses
    ``session_window`` with state cleanup via the watermark."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.session_window("ts", gap).alias("sw"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
