"""Event-stream queries over the ``events`` table.

These re-express the reference's event semantics relationally (reference:
src/main.zig:169-210 topic filter; docunomicon/README.md event model):
topic routing with null-tolerant matching, dynamic JSON payload access,
sessionization, event-time tumbling windows, and an as-of join from the
event stream to a dimension-with-history (orders).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from sanctum_spark.io import load_table
from sanctum_spark.queries import register
from sanctum_spark.queries.util import (
    money_round,
    sql_int_grain,
    sql_json_int,
    sql_money_round,
    stable_round,
)


@register(
    "q60_topic_routing",
    f"""
    SELECT user_id,
           COUNT(*)                              AS n_events,
           {sql_money_round('SUM(value)')}       AS total_value
    FROM events
    WHERE event_type IS NULL OR event_type = 'click'
    GROUP BY user_id
    """,
    doc=(
        "Topic filter with the reference's null semantics: a NULL topic "
        "matches every spell (src/main.zig:192-196) — hence the IS NULL "
        "arm. total_value uses money_round (5e-7 eps, both sides): the "
        "prior bare ROUND(SUM(value), 2) diverged cross-engine when the "
        "float sum landed exactly on a .xx5 half boundary (r8 fuzz "
        "sweep, seed 7: 545.835 — Spark's BigDecimal shortest-repr "
        "rounding vs DuckDB's binary expansion)."
    ),
)
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    routed = ev.filter(F.col("event_type").isNull() | (F.col("event_type") == "click"))
    return routed.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        money_round(F.sum("value")).alias("total_value"),
    )


@register(
    "q61_json_props",
    f"""
    SELECT {sql_json_int("props", "'$.k'")} AS k,
           COUNT(*)             AS n,
           ROUND(AVG(value) + 1e-9, 4) AS avg_value
    FROM events
    GROUP BY 1
    """,
    doc="dynamic JSON payload access (events.props is the schemaless payload).",
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").try_cast("long"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), stable_round(F.avg("value"), 4).alias("avg_value"))
    )


@register(
    "q62_sessionize",
    """
    WITH gaps AS (
        SELECT user_id, epoch_ns(ts) AS ts_ns, event_id,
               CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w > 1800000000000
                         OR LAG(epoch_ns(ts)) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts_ns, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    doc=(
        "batch sessionization: 30-min-gap session ids via lag + running "
        "sum; gaps compared on exact nanosecond epochs on both engines."
    ),
)
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts_ns", "event_id")
    prev_ts = F.lag("ts_ns").over(w)
    new_session = F.when(
        prev_ts.isNull() | (F.col("ts_ns") - prev_ts > 1_800_000_000_000), 1
    ).otherwise(0)
    wrun = (
        W.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        ev.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(wrun).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "q63_asof_join",
    """
    SELECT event_id, user_id, o_orderkey AS last_orderkey
    FROM (
        SELECT e.event_id, e.user_id, o.o_orderkey,
               ROW_NUMBER() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC NULLS LAST,
                            o.o_orderkey DESC NULLS LAST
               ) AS rn
        FROM events e
        LEFT JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    ) t
    WHERE rn = 1
    """,
    doc=(
        "as-of join: each event matched to the most recent prior order of "
        "the same user. Uses the merge-scan strategy (union + per-user "
        "last(ignorenulls) over the time-interleaved stream): zero "
        "fan-out, intermediate size |events| + |orders| regardless of "
        "per-user history depth — the rank strategy's pre-rank join grows "
        "linearly with order history per event. Oracle SQL stays the "
        "rank-based spec; identical results prove the strategies agree."
    ),
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctum_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("o_date_ts"),
        "o_orderkey",
    )
    return asof_join(
        ev,
        orders,
        on="user_id",
        left_time="ts",
        right_time="o_date_ts",
        strategy="merge",
    ).select("event_id", "user_id", F.col("o_orderkey").alias("last_orderkey"))


@register(
    "q64_tumbling_window",
    f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*)             AS n,
           CAST(SUM({sql_int_grain('value', 3)}) AS BIGINT) AS total_value_e3
    FROM events
    GROUP BY 1, 2
    """,
    doc=(
        "event-time tumbling window (batch form of the streaming windowed "
        "agg). The value sum is pinned at integer e3 grain — each event's "
        "value becomes a BIGINT at the scan and the SUM is exact integer "
        "arithmetic on both engines. The prior ROUND(SUM(value), 2) pin "
        "diverged under the r6 fuzz sweep: engine summation ORDER shifts "
        "the double sum by ulps, and a sum within an ulp of a .xx5 "
        "boundary rounds differently per engine — per-row grain "
        "evaluates the identical double expression on identical inputs, "
        "so the ints (and their sum) match bit-exactly at any order."
    ),
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctum_spark.queries.util import int_grain

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(int_grain(F.col("value"), 3)).alias("total_value_e3"),
        )
    )


@register(
    "q65_event_pivot",
    """
    SELECT user_id,
           COUNT(*) FILTER (event_type = 'click')    AS click,
           COUNT(*) FILTER (event_type = 'view')     AS view,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup')   AS signup,
           COUNT(*) FILTER (event_type = 'error')    AS error
    FROM events GROUP BY user_id
    """,
    doc="pivot event types to columns (demux of a topic-routed stream).",
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    for k in kinds:
        out = out.withColumn(k, F.coalesce(F.col(k), F.lit(0)))
    return out
