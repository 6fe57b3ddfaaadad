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


def streaming_partial_rollup(
    events: DataFrame,
    grain: str = "1 hour",
    watermark: str = "1 hour",
    keys: list[str] | None = None,
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Continuous hypertable maintenance: emit the same mergeable
    (bucket, *keys, n, sum, min, max) partials as
    ``operators.rollup.partial_rollup``, but from a stream with a
    watermark, so append mode finalizes each bucket once the watermark
    passes it (late data beyond the watermark is dropped, matching the
    batch rollup's "late data rewrites the touched bucket" contract at
    the ingest tier instead).

    The appended partials land in the same schema the batch
    ``merge_rollup`` consumes, so daily/monthly views keep re-aggregating
    one combined partial table regardless of whether rows arrived via
    stream or backfill — the lambda-architecture join point, tested in
    tests/test_streaming.py.
    """
    keys = keys if keys is not None else ["event_type"]
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, grain).alias("win"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(F.col("win.start").alias("bucket"), *keys, "n", "sum_value", "min_value", "max_value")
    )
