"""Source-format coverage (SURVEY §2.3 scans/sources row): json/csv
round trips through the generic reader, and the sliding-window builder
against its batch equivalent."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from sanctum_spark.io import load_table, read_source
from sanctum_spark.streaming import sources as SRC
from sanctum_spark.streaming import windows as WIN


def test_json_source_roundtrip(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    p = str(tmp_path / "ev_json")
    ev.write.json(p)
    back = read_source(spark, p, "json", schema=ev.schema)
    assert back.count() == ev.count()
    a = sorted(map(tuple, ev.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_csv_source_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    p = str(tmp_path / "docs_csv")
    docs.write.option("header", "true").csv(p)
    back = read_source(spark, p, "csv", schema=docs.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))


def test_sliding_window_matches_batch(spark, sf_dir, tmp_path):
    stage = str(tmp_path / "stage")
    SRC.stage_event_stream(spark, sf_dir, stage, n_files=3)
    stream = SRC.events_file_stream(spark, stage)
    agg = WIN.sliding_window_agg(stream, window_size="1 hour", slide="15 minutes")
    name = f"slide_{uuid.uuid4().hex[:8]}"
    SRC.run_to_memory(agg, name, output_mode="complete")
    got = {(r["window_start"], r["n"]) for r in spark.table(name).collect()}
    ev = load_table(spark, sf_dir, "events")
    want = {
        (r["window_start"], r["n"])
        for r in (
            ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("win.start").alias("window_start"), "n")
        ).collect()
    }
    assert got == want
    # every event lands in windowsize/slide = 4 overlapping windows
    assert sum(n for _, n in got) == 4 * ev.count()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Appended batches with added/missing columns must union under
    mergeSchema (the 100 TB reality: schemas evolve mid-corpus; old files
    surface NULL for columns they predate)."""
    from pyspark.sql import functions as F

    from sanctum_spark.io import read_source

    d = str(tmp_path / "evolving")
    spark.range(3).select(F.col("id"), F.lit("a").alias("old_col")).write.parquet(
        d + "/batch=1"
    )
    spark.range(3).select(
        F.col("id"), F.lit(7).alias("new_col")
    ).write.parquet(d + "/batch=2")
    df = read_source(spark, d, "parquet", mergeSchema="true")
    cols = set(df.columns)
    assert {"id", "old_col", "new_col", "batch"} <= cols
    assert df.count() == 6
    # old files yield NULL for the late-added column
    assert df.filter(F.col("new_col").isNull()).count() == 3
