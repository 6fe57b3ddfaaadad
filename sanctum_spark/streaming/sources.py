"""Streaming sources over the synthetic event schema.

The reference's only source is a single seed file evaluated once
(reference: src/main.zig:94-112); the generalized engine treats the
events table as an ordered immutable stream (README.md:142).  Batch
parquet is replayed as a file-source stream; the rate source backs
load/soak tests.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

# events schema as written by ``stage_event_stream`` (µs timestamp + exact
# nanosecond epoch, matching sanctum_spark.io.load_table('events')).
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("ts_ns", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stage_event_stream(
    spark: SparkSession,
    sf_dir: str,
    stage_dir: str,
    n_files: int = 4,
    shuffle_within: bool = False,
) -> str:
    """Replay-stage the batch events table as n_files parquet files ordered
    by event time, so a file stream with maxFilesPerTrigger=1 replays the
    stream in n_files micro-batches (event-time order across batches —
    what a resumed durable log would deliver).

    ``shuffle_within=True`` permutes rows INSIDE each file (deterministic
    hash order) while keeping the files' event-time ranges disjoint: the
    delivery model of a real ingest, where a micro-batch's rows arrive
    from many partitions in no particular order but batches still advance
    in event time.  Operator results must not depend on intra-batch
    order (tests/test_streaming_delivery.py)."""
    from sanctum_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    return stage_events_df(ev, stage_dir, n_files=n_files, shuffle_within=shuffle_within)


def stage_events_df(
    ev: DataFrame,
    stage_dir: str,
    n_files: int = 4,
    shuffle_within: bool = False,
) -> str:
    """DataFrame-level form of ``stage_event_stream`` for callers with a
    synthesized or derived event log (tools/param_fuzz.py's streaming
    family): same bucketing, intra-file order model, and mtime stamping,
    any events-schema input."""
    staged = ev.withColumn(
        "_bucket",
        F.ntile(n_files).over(W.orderBy("ts_ns", "event_id")),
    ).repartitionByRange(n_files, "_bucket")
    if shuffle_within:
        staged = staged.sortWithinPartitions(
            F.sha2(F.col("event_id").cast("string"), 256)
        )
    else:
        staged = staged.sortWithinPartitions("ts_ns", "event_id")
    (
        staged.drop("_bucket")
        .write.mode("overwrite")
        .parquet(stage_dir)
    )
    # The file source batches by modification time; all parts share one
    # mtime after a single write, making replay order (and therefore
    # watermark progression) nondeterministic.  Stamp ascending mtimes in
    # part order (range partitions are bucket-ordered) so micro-batches
    # replay in event-time order like a durable log would.
    parts = sorted(
        f for f in os.listdir(stage_dir) if f.startswith("part-") and f.endswith(".parquet")
    )
    base = int(time.time()) - len(parts) * 10
    for i, f in enumerate(parts):
        os.utime(os.path.join(stage_dir, f), (base + i * 10, base + i * 10))
    return stage_dir


def events_file_stream(
    spark: SparkSession, stage_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stage_dir)
    )


def rate_stream(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Synthetic event stream from the rate source (soak/throughput tests):
    same envelope as the events table."""
    kinds = F.array(*[F.lit(k) for k in ["click", "view", "purchase", "signup", "error"]])
    r = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return r.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.unix_micros("timestamp") * 1000).alias("ts_ns"),
        (F.col("value") % 15).alias("user_id"),
        F.element_at(kinds, (F.col("value") % 5 + 1).cast("int")).alias("event_type"),
        (F.col("value") % 1000 / 10.0).alias("value"),
        F.to_json(F.struct((F.col("value") % 100).alias("k"))).alias("props"),
    )


def run_to_memory(
    stream_df: DataFrame, table_name: str, output_mode: str = "append", checkpoint: str | None = None
):
    """Drain a stream into an in-memory sink with availableNow, blocking
    until all staged input is processed.  Returns the query (stopped)."""
    writer = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()
    return q
