"""Durable event log + storage layout helpers.

The reference declares (but never built) a durable event log
(reference: README.md:106).  Here it is the storage contract an engine at
100 TB actually needs:

- **date-partitioned parquet append log**: writes are append-only and
  idempotent per batch; reads prune partitions on the date predicate so
  a one-day replay touches 1/365th of the log.
- **bucketed tables**: facts bucketed on their join key join WITHOUT a
  shuffle (SortMergeJoin over co-located buckets); at 100 TB the shuffle
  saved is the whole job.
- **streaming append**: writeStream into the same layout with exactly-once
  file-sink semantics via the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_LOG_PARTITION_COL = "event_date"


def write_event_log(
    events: DataFrame,
    path: str,
    mode: str = "append",
    max_records_per_file: int = 1_000_000,
) -> None:
    """Append a batch of events to the durable log, partitioned by event
    date (derived from ``ts``)."""
    (
        events.withColumn(EVENT_LOG_PARTITION_COL, F.to_date("ts"))
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(EVENT_LOG_PARTITION_COL)
        .parquet(path)
    )


def read_event_log(
    spark: SparkSession, path: str, start_date: str | None = None, end_date: str | None = None
) -> DataFrame:
    """Read the log back; date bounds become partition filters (pruned at
    planning time — verify with .explain: PartitionFilters)."""
    df = spark.read.parquet(path)
    if start_date is not None:
        df = df.filter(F.col(EVENT_LOG_PARTITION_COL) >= F.lit(start_date))
    if end_date is not None:
        df = df.filter(F.col(EVENT_LOG_PARTITION_COL) < F.lit(end_date))
    return df


def stream_to_event_log(events_stream: DataFrame, path: str, checkpoint: str):
    """Streaming append into the same layout (exactly-once via the file
    sink's transaction log + checkpoint).  Returns the started query."""
    return (
        events_stream.withColumn(EVENT_LOG_PARTITION_COL, F.to_date("ts"))
        .writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy(EVENT_LOG_PARTITION_COL)
        .trigger(availableNow=True)
        .start()
    )


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Two tables bucketed on the same key with the same bucket count join
    with NO Exchange on either side — the 100 TB co-located-join layout.
    ``n_buckets`` should scale with data volume (buckets of ~128-512 MB).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
