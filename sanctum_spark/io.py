"""Parquet loaders for the synthetic star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an sf dir.

Scans stay declarative (``spark.read.parquet``) so Catalyst performs
predicate pushdown / column pruning into the parquet reader; never collect
or pre-materialize here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCASTABLE = {"region", "nation", "supplier", "customer", "part"}


# DataFrame handles are immutable plans — memoize per (session, dir, table)
# so a 69-query suite doesn't re-read parquet footers 69 times.
_df_cache: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    key = (id(spark), sf_dir, name)
    cached = _df_cache.get(key)
    if cached is not None:
        return cached
    if name == "events":
        # Older generations of events.parquet store TIMESTAMP(NANOS);
        # surface those as long even on sessions not built by
        # sanctum_spark.session (e.g. the driver's own SparkSession —
        # this conf is dynamic). Harmless for µs-encoded data.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the derived ts/ts_ns columns are session-TZ-sensitive
        # (timestamp_micros / unix_micros + date_trunc); pin UTC so results
        # match the TZ-naive DuckDB oracle regardless of the host's TZ
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts has shipped in two encodings across testdata
        # generations: TIMESTAMP(NANOS) (surfaced as a nanosecond long via
        # nanosAsLong) and plain timestamp[us] (surfaced as TIMESTAMP_NTZ).
        # Adapt on schema and expose the same two columns either way:
        # - ts:    µs-precision TimestampType (Spark's native maximum)
        # - ts_ns: the exact nanosecond epoch for lossless comparisons
        #   (for µs data ns = µs*1000, matching DuckDB's epoch_ns exactly)
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            # FLOOR division ns→µs (DIV truncates toward zero, which would
            # shift pre-epoch timestamps one µs late vs DuckDB's flooring
            # epoch conversion). Integer-exact: no double roundtrip, which
            # at ~1.7e18 ns would cost up to ~256 ns of mantissa error.
            ts_col = F.timestamp_micros(
                F.expr(
                    "CAST(ts DIV 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END) AS LONG)"
                )
            )
            ns_col = F.col("ts")
        else:
            # cast NTZ -> TimestampType under the pinned-UTC session so
            # downstream code sees one type for both encodings
            ts_col = F.col("ts").cast("timestamp")
            ns_col = F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
        df = df.select(
            "event_id",
            ts_col.alias("ts"),
            ns_col.alias("ts_ns"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    _df_cache[key] = df
    return df


# Footer-derived split counts, memoized per (sf_dir, table): the guard
# below is consulted on hot query-construction paths, so it must never
# trigger a Spark plan conversion or re-read footers per call.
_split_cache: dict[tuple[str, str], int] = {}


def parquet_split_count(sf_dir: str, name: str) -> int:
    """Parquet ROW-GROUP count across the table's files — the scan's
    maximum useful parallelism, from footer metadata only (zero Spark
    jobs, memoized).

    Parquet is unsplittable below one row group, so row groups — not
    Spark's byte-range splits — bound how many tasks can carry real
    data: a single-row-group file larger than maxPartitionBytes still
    reports many splits, but all except one are empty (the r13 guard
    read exactly that inflated split count and skipped the repartition
    in its own motivating case — r13 ADVICE item 2).
    """
    key = (sf_dir, name)
    cached = _split_cache.get(key)
    if cached is not None:
        return cached
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    total = 0
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(
                        os.path.join(root, f)
                    ).metadata.num_row_groups
    else:
        total = pq.ParquetFile(path).metadata.num_row_groups
    _split_cache[key] = total
    return total


def spread_scan(df: DataFrame, input_splits: int | None = None) -> DataFrame:
    """Fan a derivation-heavy small scan out to the session's parallelism.

    Parquet is unsplittable below one row group, so a scan of a
    single-row-group file runs as ONE task — and any expensive per-row
    derivation Catalyst fuses into that scan stage (shingling,
    tokenization, n-gram explode, MinHash) serializes on one core before
    its first shuffle.  A round-robin repartition to defaultParallelism
    moves that work onto every core for the price of shuffling the
    (small) base table once.

    Scale-adaptive by construction: when the input already spreads over
    at least defaultParallelism units (multi-row-group / multi-file
    tables at production scale), this is a no-op and no exchange is
    added — so it never degenerates into a full-corpus reshuffle at
    100 TB.  Apply it only where the per-row derivation is the measured
    cost (r13: q74/q99/q109/q122/q142/q158); for cheap projections the
    added exchange is a pure loss.

    ``input_splits`` is the caller-supplied data spread — row groups
    from parquet footers (:func:`parquet_split_count`), which is both
    probe-free (the r13 ``df.rdd.getNumPartitions()`` guard forced a
    physical plan conversion per call) and correct for oversized
    single-row-group files (byte-range splits over-count them; row
    groups don't).  Without it the old plan-partition probe is kept as
    the fallback for non-parquet inputs.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    spread = input_splits if input_splits is not None else df.rdd.getNumPartitions()
    if spread >= target:
        return df
    return df.repartition(target)


def read_source(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Generic batch source: parquet / json / csv / orc.

    JSON and CSV get schema-on-read when a schema is passed (always pass
    one in production — inference is a full extra scan at 100 TB).
    """
    reader = spark.read.format(format)
    if schema is not None:
        reader = reader.schema(schema)
    if format == "csv":
        options.setdefault("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def parquet_row_count(sf_dir: str, name: str) -> int:
    """Exact row count from parquet FOOTER metadata — zero Spark jobs.

    The footer's row-group counts are exact (written by the writer, not
    sampled), so this is the cheapest correct cardinality source for a
    plain table scan: at 100 TB it reads a few KiB per file instead of
    scanning the corpus.  Used by cost-based plan switches
    (dedup.ngram_jaccard_pairs(prefix_filter="auto", doc_count=...)) to
    avoid an eager df.count() job at plan-construction time.  Handles
    both a single .parquet file and a directory of part files.
    """
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
        return total
    return pq.ParquetFile(path).metadata.num_rows
