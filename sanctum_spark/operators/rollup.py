"""Hypertable-style time rollups: mergeable partial aggregates.

The 100 TB pattern (named in the builder brief as a custom operator Spark
lacks): raw events are aggregated ONCE into fine-grain partial-aggregate
tables (hour buckets), and every coarser view (day, month) is produced by
re-aggregating the partials — counts and sums add, min/max fold — without
ever rescanning the raw table. On a cluster the partial table is written
partitioned by bucket date, so a monthly rollup reads ~720 partial rows
per key instead of billions of raw rows, and late-arriving data only
rewrites the touched fine-grain buckets.

Correctness hinges on every aggregate being MERGEABLE: avg is therefore
stored as (sum, n) and derived at read time — never averaged across
buckets. The oracle for q100 proves merge(partials) == direct(raw).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: grains date_trunc understands, ordered fine → coarse
GRAINS = ("hour", "day", "week", "month", "quarter", "year")


def partial_rollup(
    df: DataFrame,
    time_col: str,
    grain: str,
    keys: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Fine-grain mergeable partials: one row per (bucket, *keys) holding
    (n, sum, min, max). One shuffle on (bucket, keys); map-side partial
    aggregation makes the shuffle payload the partial rows, not events."""
    if grain not in GRAINS:
        raise ValueError(f"grain must be one of {GRAINS}, got {grain!r}")
    return df.groupBy(
        F.date_trunc(grain, F.col(time_col)).alias("bucket"), *keys
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def merge_rollup(
    partials: DataFrame, grain: str, keys: Sequence[str]
) -> DataFrame:
    """Re-aggregate partials to a coarser grain WITHOUT touching raw data:
    n and sum add, min/max fold. The input is already tiny (one row per
    fine bucket per key), so this shuffle is negligible at any scale."""
    if grain not in GRAINS:
        raise ValueError(f"grain must be one of {GRAINS}, got {grain!r}")
    return partials.groupBy(
        F.date_trunc(grain, F.col("bucket")).alias("bucket"), *keys
    ).agg(
        F.sum("n").alias("n"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def with_avg(rolled: DataFrame, scale: int = 6) -> DataFrame:
    """Derive avg from the mergeable (sum, n) pair — the only correct way
    to average across merged buckets (avg-of-avgs weights buckets
    wrongly)."""
    from sanctum_spark.queries.util import stable_round

    return rolled.withColumn(
        "avg_value", stable_round(F.col("sum_value") / F.col("n"), scale)
    )
