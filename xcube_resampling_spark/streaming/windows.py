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


def streaming_cube_rollup(
    pixels: DataFrame,
    window_duration: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Streaming counterpart of ``resample_time_agg``
    (operators/temporal.py): granules land as micro-batches of
    ``(ts, j, i, value)`` rows and the engine maintains NaN-aware
    per-pixel rollups over tumbling event-time windows.

    This is the live-ingest shape of a 100-TB cube pipeline: each new
    scene only touches its own window's state, the watermark expires
    state for windows no late granule can still join, and the groupBy
    is the same single map-side-combinable exchange as the batch
    operator.  On a batch DataFrame it degrades to a plain GROUP BY,
    which is how the unit tests pin window values exactly.

    Emits per (window-start, j, i): NaN-aware ``mean_value``, the count
    of valid observations ``n_valid``, and the total observation count
    ``n_obs`` (so downstream can distinguish "all-NaN window" from
    "no coverage yet").
    """
    src = pixels
    if pixels.isStreaming:
        src = pixels.withWatermark("ts", watermark)
    v = F.col("value")
    nv = F.when(F.isnan(v), F.lit(None).cast("double")).otherwise(v)
    return (
        src.groupBy(
            F.window("ts", window_duration).alias("win"), "j", "i"
        )
        .agg(
            F.coalesce(F.avg(nv), F.lit(float("nan"))).alias(
                "mean_value"
            ),
            F.count(nv).alias("n_valid"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "j", "i", "mean_value", "n_valid", "n_obs",
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
