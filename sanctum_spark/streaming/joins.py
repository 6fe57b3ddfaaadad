"""Streaming joins.

- stream-static: enrich an event stream with a dimension table (the
  broadcast side is re-read per micro-batch; no state).
- stream-stream interval join: both sides buffered in the state store,
  bounded by watermarks + the time-band condition — the streaming form of
  the batch CEP sequence query (q86).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dimension(
    events: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Stream-static join: per micro-batch broadcast of the dimension."""
    return events.join(F.broadcast(dim), on, how)


def _interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    within: str,
    watermark: str,
    suffixes: tuple[str, str],
    how: str,
) -> DataFrame:
    """Shared builder for the stream-stream interval joins: suffixed
    columns, per-side watermarks, and the strictly-after/within-band
    condition live in ONE place so inner and outer semantics cannot
    diverge."""
    ls, rs = suffixes
    lcols = [F.col(c).alias(c + ls) for c in left.columns]
    rcols = [F.col(c).alias(c + rs) for c in right.columns]
    lw = left.select(lcols).withWatermark(left_time + ls, watermark)
    rw = right.select(rcols).withWatermark(right_time + rs, watermark)
    cond = (
        (F.col(key + ls) == F.col(key + rs))
        & (F.col(right_time + rs) > F.col(left_time + ls))
        & (
            F.col(right_time + rs)
            <= F.col(left_time + ls) + F.expr(f"INTERVAL {within}")
        )
    )
    return lw.join(rw, cond, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str = "ts",
    right_time: str = "ts",
    within: str = "30 minutes",
    watermark: str = "1 hour",
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Join right events to left events of the same key occurring strictly
    after the left event and within ``within``.

    Both sides carry watermarks so the state store evicts buffered rows
    once they can no longer match — state is bounded by
    (watermark + within) x arrival rate, independent of stream length.
    """
    return _interval_join(
        left, right, key, left_time, right_time, within, watermark, suffixes, "inner"
    )


def stream_stream_interval_join_outer(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str = "ts",
    right_time: str = "ts",
    within: str = "30 minutes",
    watermark: str = "1 hour",
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Left-outer variant of the interval join: a left event that finds no
    right match is EMITTED WITH NULLS once the watermark passes the end of
    its match window (the state store can then prove no match can arrive).

    This is the funnel-with-dropouts shape (q95's batch semantics on a
    stream): matched conversions flow immediately; non-converting events
    surface as (left, null) exactly one watermark later — bounded state,
    no "did they ever convert?" rescan.
    """
    return _interval_join(
        left,
        right,
        key,
        left_time,
        right_time,
        within,
        watermark,
        suffixes,
        "leftOuter",
    )
