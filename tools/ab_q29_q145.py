"""Interleaved paired A/B for the r14 q29/q145 rewrite candidates.

One JVM, old/new alternated per pair, cache cleared between runs,
median of pair ratios + full sorted-output identity. Usage:

    python tools/ab_q29_q145.py [pairs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sanctum_spark import queries as qreg  # noqa: E402
from sanctum_spark.io import load_table  # noqa: E402
from sanctum_spark.queries.util import stable_round  # noqa: E402
from sanctum_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def q29_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    supp = load_table(spark, sf_dir, "supplier")
    # pre-filter the fact side with a broadcast semi-join on the selective
    # part set BEFORE the aggregate (guide 3.2)
    li_f = li.join(
        F.broadcast(part.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    cost = li_f.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    # argmin per part as an aggregate (map-side partial agg, no sort):
    # lexicographic struct min == ROW_NUMBER ORDER BY unit_cost, l_suppkey
    best = cost.groupBy("l_partkey").agg(
        F.min(F.struct("unit_cost", "l_suppkey")).alias("b")
    ).select(
        "l_partkey",
        F.col("b.unit_cost").alias("unit_cost"),
        F.col("b.l_suppkey").alias("l_suppkey"),
    )
    return (
        best.join(F.broadcast(part), part.p_partkey == best.l_partkey)
        .join(F.broadcast(supp), F.col("s_suppkey") == best.l_suppkey)
        .select(
            "p_partkey",
            "p_name",
            F.col("s_name").alias("best_supplier"),
            stable_round(F.col("unit_cost"), 4).alias("unit_cost"),
        )
    )


def q145_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    wt = Window.partitionBy("event_type")
    with_med = ev.withColumn("med", F.percentile("value", F.lit(0.5)).over(wt))
    with_mad = with_med.withColumn(
        "mad",
        F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).over(wt),
    )
    is_out = F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad")
    return with_mad.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        stable_round(F.first("med"), 4).alias("med"),
        stable_round(F.first("mad"), 4).alias("mad"),
        F.sum(F.when(is_out, 1).otherwise(0)).cast("long").alias("n_outliers"),
    )


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab_q29_q145")
    reg = qreg.queries()
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    li.groupBy("l_returnflag").count().collect()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    for name, old_fn, new_fn in [
        ("q29_min_cost_supplier", reg["q29_min_cost_supplier"], q29_new),
        ("q145_mad_outliers", reg["q145_mad_outliers"], q145_new),
    ]:
        a = sorted(map(tuple, old_fn(spark, SF_DIR).collect()))
        b = sorted(map(tuple, new_fn(spark, SF_DIR).collect()))
        ident = a == b
        print(f"{name}: rows {len(a)}/{len(b)} identical={ident}", flush=True)
        if not ident:
            diff = [x for x, y in zip(a, b) if x != y][:3]
            print("  first diffs:", diff, flush=True)
            continue
        ratios = []
        for i in range(pairs):
            ts = {}
            for tag, fn in (("old", old_fn), ("new", new_fn)):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).count()
                ts[tag] = time.perf_counter() - t0
                spark.catalog.clearCache()
            ratios.append(ts["new"] / ts["old"])
            print(
                f"  pair {i}: old {ts['old']:.3f} new {ts['new']:.3f} "
                f"ratio {ratios[-1]:.3f}",
                flush=True,
            )
        print(f"{name}: median ratio {statistics.median(ratios):.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
