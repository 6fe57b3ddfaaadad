"""Interleaved paired A/B for the r14 q04/q39 rewrite candidates."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sanctum_spark import queries as qreg  # noqa: E402
from sanctum_spark.io import load_table  # noqa: E402
from sanctum_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def q04_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    # EXISTS(l_shipdate > o_orderdate) == MAX(l_shipdate) > o_orderdate:
    # aggregate lineitem to one row per order BEFORE the join (guide 2.3)
    li_max = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("mx"))
    j = orders.join(
        li_max,
        (orders.o_orderkey == li_max.l_orderkey)
        & (li_max.mx > orders.o_orderdate),
    )
    return j.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


def q39_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("mx"),
        F.collect_set(F.struct("l_shipdate", "l_suppkey")).alias("ps"),
    )
    winners = (
        per_order.withColumn(
            "supps",
            F.array_distinct(F.transform("ps", lambda p: p["l_suppkey"])),
        )
        .filter(F.size("supps") > 1)
        .select(
            "l_orderkey",
            F.explode(
                F.transform(
                    F.filter("ps", lambda p: p["l_shipdate"] == F.col("mx")),
                    lambda p: p["l_suppkey"],
                )
            ).alias("l_suppkey"),
        )
    )
    return (
        winners.join(F.broadcast(supp), supp.s_suppkey == winners.l_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count_distinct("l_orderkey").alias("n_orders_held_up"))
    )


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab_q04_q39")
    reg = qreg.queries()
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    li.groupBy("l_returnflag").count().collect()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    for name, old_fn, new_fn in [
        ("q04_order_priority", reg["q04_order_priority"], q04_new),
        ("q39_last_shipper", reg["q39_last_shipper"], q39_new),
    ]:
        a = sorted(map(tuple, old_fn(spark, SF_DIR).collect()))
        b = sorted(map(tuple, new_fn(spark, SF_DIR).collect()))
        ident = a == b
        print(f"{name}: rows {len(a)}/{len(b)} identical={ident}", flush=True)
        if not ident:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
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
