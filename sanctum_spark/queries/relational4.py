"""Fourth batch: map-typed payload access, regexp extraction, date
arithmetic, array manipulation — rounding out the scalar-function surface
(SURVEY.md §2.3 scalar fns row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sanctum_spark.io import load_table
from sanctum_spark.queries import register
from sanctum_spark.queries.util import sql_json_int


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q67_props_as_map",
    f"""
    SELECT k AS prop_key,
           COUNT(*) AS n,
           CAST(SUM({sql_json_int("props", "'$.' || k")}) AS BIGINT) AS total
    FROM (SELECT props, UNNEST(json_keys(TRY_CAST(props AS JSON))) AS k FROM events) t
    GROUP BY k
    """,
    doc=(
        "schemaless payload as a typed map: from_json to "
        "map<string,string> + per-value try_cast(long), explode, "
        "aggregate per key (the dynamic-event-field access path). The "
        "string-map parse survives mixed-type payloads — a typed "
        "map<string,long> would NULL the whole map on one bad value and "
        "drop the event from the key counts (r6 degenerate-row sweep)."
    ),
)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # parse as map<string,string> then try_cast values: a typed
    # map<string,long> parse NULLs the ENTIRE map when any value fails
    # coercion, silently dropping the event from the key counts — with
    # string values the key count survives mixed-type payloads and
    # non-integer values contribute NULL to the sum, matching the
    # oracle's per-key json_type guard (r6 degenerate-row sweep)
    m = F.from_json("props", T.MapType(T.StringType(), T.StringType()))
    return (
        ev.select(F.explode(m).alias("prop_key", "vs"))
        .groupBy("prop_key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("vs").try_cast("long")).alias("total"),
        )
    )


@register(
    "q68_regexp_extract",
    """
    SELECT regexp_extract(p_brand, 'Brand#([0-9]+)', 1)        AS brand_num,
           COUNT(*)                                            AS n_parts,
           CAST(SUM(CASE WHEN regexp_matches(p_name, '^(small|large)')
                         THEN 1 ELSE 0 END) AS BIGINT)         AS n_sized
    FROM part
    GROUP BY 1
    """,
    doc="regexp extraction + boolean regexp predicate aggregation.",
)
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.groupBy(
            F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).alias("brand_num")
        )
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(
                F.when(F.col("p_name").rlike(r"^(small|large)"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_sized"),
        )
    )


@register(
    "q69_date_arithmetic",
    """
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP)        AS due_date,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)  AS month_end,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00',
                          o_orderdate) AS BIGINT)                  AS days_since_95,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT)              AS dow,
           CAST(quarter(o_orderdate) AS BIGINT)                    AS qtr
    FROM orders
    """,
    doc="date arithmetic family: interval add, last_day, datediff, parts.",
)
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
    )


@register(
    "q43_array_manipulation",
    """
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           ROUND(list_sort(CAST(embedding[1:5] AS DOUBLE[]))[1] + 1e-9, 5)  AS smallest_head,
           ROUND(list_sort(CAST(embedding[1:5] AS DOUBLE[]))[5] + 1e-9, 5)  AS largest_head,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS BIGINT) AS n_positive
    FROM embeddings
    """,
    doc="array manipulation: slice/sort/index/filter over embeddings.",
)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctum_spark.queries.util import stable_round

    emb = _t(spark, sf_dir, "embeddings")
    dvec = F.transform("embedding", lambda x: x.cast("double"))
    head_sorted = F.sort_array(F.slice(dvec, 1, 5))
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        # try_element_at: empty/ragged vectors yield NULL like DuckDB's
        # out-of-bounds list index (bare element_at: ANSI crash)
        stable_round(F.try_element_at(head_sorted, F.lit(1)), 5).alias("smallest_head"),
        stable_round(F.try_element_at(head_sorted, F.lit(5)), 5).alias("largest_head"),
        F.size(F.filter(dvec, lambda x: x > 0)).cast("long").alias("n_positive"),
    )
