"""Watermarked windowed aggregation builders.

Event-time semantics for the reference's "ordered event streams": late
data beyond the watermark is dropped; tumbling/sliding windows are the
streaming analogs of the batch q64 rollup; session windows are the
streaming analog of the batch q62 sessionization (same 30-min gap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "1 hour",
    time_col: str = "ts",
) -> DataFrame:
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window_size).alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "1 hour",
    time_col: str = "ts",
) -> DataFrame:
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window_size, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("window_start"), "n")
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    time_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows keyed per user — the streaming form of q62."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.session_window(time_col, gap).alias("sess"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame, keys: list[str], watermark: str | None = None, time_col: str = "ts"
) -> DataFrame:
    """Streaming exact dedup.  With a watermark, state is bounded
    (dropDuplicatesWithinWatermark); without, state grows with distinct
    keys (test scale only)."""
    if watermark is not None:
        return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
