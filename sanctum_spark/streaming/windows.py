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


def windowed_bin_counts(
    events: DataFrame,
    mn: float,
    mx: float,
    n_bins: int = 10,
    window_size: str = "6 hours",
    watermark: str = "1 hour",
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming half of a windowed drift monitor: per event-time window,
    equi-width bin counts of ``value_col`` over fixed [mn, mx) bounds
    (the bounds come from the BASELINE profile — q150's batch pass — so
    every window bins identically to the reference distribution).

    This is the only corpus-weight stage of the monitor; the PSI algebra
    itself runs on bin-grain rows via :func:`psi_from_counts` after the
    counts leave the stream (chaining a second stateful aggregation
    inside the stream buys nothing — the count table is already
    windows x bins tiny)."""
    # degenerate baseline (constant column): infinite width puts ALL
    # values in bin 0, exactly the q150 batch convention
    width = (mx - mn) / float(n_bins) if mx > mn else float("inf")
    # clamp BOTH ends: live data can drift outside the historical
    # baseline's [mn, mx] in either direction — values below mn pile into
    # bin 0 and above mx into bin n-1, so out-of-range drift inflates the
    # edge-bin shares and raises PSI instead of silently vanishing (an
    # unclamped negative bin would never join the baseline spine)
    bin_col = F.greatest(
        F.lit(0),
        F.least(
            F.lit(n_bins - 1),
            F.floor((F.col(value_col) - F.lit(mn)) / F.lit(width)),
        ),
    ).cast("long")
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(
            F.window(time_col, window_size).alias("win"), bin_col.alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("window_start"), "bin", "n")
    )


def psi_from_counts(
    counts: DataFrame, baseline: DataFrame, n_bins: int = 10
) -> DataFrame:
    """Batch half of the drift monitor: per window, the PSI of the
    window's Laplace-smoothed bin shares against ``baseline`` shares
    ((bin, share) rows, q150 smoothing convention).  Missing bins
    zero-fill through the baseline's bin spine.  Input is bin-grain, so
    every stage here is bounded by windows x bins."""
    # fresh attribute ids on the spine side (ws/sbin) — the spine derives
    # from `counts` itself, and joining two branches of one lineage on
    # same-exprId columns is a Catalyst ambiguity error
    spine = (
        counts.select(F.col("window_start").alias("ws"))
        .distinct()
        .crossJoin(F.broadcast(baseline.select(F.col("bin").alias("sbin"))))
    )
    full = (
        spine.join(
            counts,
            (F.col("ws") == counts["window_start"])
            & (F.col("sbin") == counts["bin"]),
            "left",
        )
        .select(
            F.col("ws").alias("window_start"),
            F.col("sbin").alias("bin"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )
    tot = full.groupBy("window_start").agg(F.sum("n").alias("nt"))
    share = (F.col("n") + 1.0) / (F.col("nt") + float(n_bins))
    scored = (
        full.join(F.broadcast(tot), "window_start")
        .join(F.broadcast(baseline), "bin")
        .select(
            "window_start",
            "bin",
            share.alias("p"),
            F.col("share").alias("q"),
        )
    )
    contrib = (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
    return scored.groupBy("window_start").agg(
        F.round(F.sum(contrib) + F.lit(1e-9), 6).alias("psi")
    )
