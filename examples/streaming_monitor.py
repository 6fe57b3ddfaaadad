"""End-to-end streaming monitor example: replay the events table as a
file stream and run the three streaming analytics surfaces side by side —
windowed PSI drift against a batch baseline, CEP pattern matching with
cross-batch NFA state, and exact streaming dedup.

    python examples/streaming_monitor.py [sf_dir]

Demonstrates the operational loop a production deployment runs: the
batch engine computes the baseline profile once; the stream then scores
every window against it, extracts funnel matches, and reports volumes.
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from sanctum_spark.io import load_table
    from sanctum_spark.session import get_spark
    from sanctum_spark.streaming import sources as SRC
    from sanctum_spark.streaming.cep import streaming_cep_pattern
    from sanctum_spark.streaming.windows import (
        psi_from_counts,
        windowed_bin_counts,
    )

    spark = get_spark("streaming_monitor")
    stage = tempfile.mkdtemp(prefix="evstream_")
    SRC.stage_event_stream(spark, sf_dir, stage, n_files=4)

    # batch side: baseline value distribution (the q150 convention)
    ev = load_table(spark, sf_dir, "events")
    mn, mx = ev.agg(F.min("value"), F.max("value")).first()
    width = (mx - mn) / 10.0 if mx > mn else float("inf")  # constant column -> all bin 0
    bins = ev.select(
        F.least(F.lit(9), F.floor((F.col("value") - mn) / width))
        .cast("long")
        .alias("bin")
    )
    nt = bins.count()
    baseline = (
        spark.range(10)
        .withColumnRenamed("id", "bin")
        .join(bins.groupBy("bin").agg(F.count(F.lit(1)).alias("n")), "bin", "left")
        .fillna(0, ["n"])
        .select("bin", ((F.col("n") + 1.0) / (nt + 10.0)).alias("share"))
    )

    # stream side: three monitors over the same replayed log
    stream = SRC.events_file_stream(spark, stage)
    (
        SRC.run_to_memory(
            windowed_bin_counts(stream, float(mn), float(mx), 10, "6 hours"),
            "mon_bins",
            output_mode="complete",
        )
    )
    SRC.run_to_memory(
        streaming_cep_pattern(
            SRC.events_file_stream(spark, stage), 172_800_000_000_000
        ),
        "mon_cep",
    )
    SRC.run_to_memory(
        SRC.events_file_stream(spark, stage).dropDuplicates(["event_id"]),
        "mon_dedup",
    )

    print("== windowed PSI vs baseline ==")
    psi_from_counts(spark.table("mon_bins"), baseline).orderBy(
        "window_start"
    ).show(truncate=False)
    n_matches = spark.table("mon_cep").count()
    n_unique = spark.table("mon_dedup").count()
    print(f"CEP view->click->purchase matches: {n_matches}")
    print(f"unique events after streaming dedup: {n_unique}")
    spark.stop()


if __name__ == "__main__":
    main()
