"""Second batch of the relational surface: TPC-H-style predicates,
correlated-subquery shapes, richer window functions, percentiles,
grouping sets, string/array/null scalar families, and self-joins.

Same cross-engine conventions as relational.py (see its module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from sanctum_spark.io import load_table, register_views
from sanctum_spark.queries import register
from sanctum_spark.queries.util import money_round, stable_round


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q06_revenue_filter",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount) + 5e-7, 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6-style: pure scan+filter+single-row agg (pushdown showcase).",
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(money_round(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))


@register(
    "q14_promo_revenue",
    """
    SELECT ROUND(100.00 * SUM(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)) + 1e-9, 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    doc="TPC-H Q14-style conditional aggregation ratio over a join.",
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            stable_round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc),
                4,
            ).alias("promo_pct")
        )
    )


@register(
    "q17_small_quantity",
    """
    SELECT ROUND(SUM(l_extendedprice) / 7.0 + 1e-9, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
        SELECT l_partkey AS a_partkey, 0.5 * AVG(l_quantity) AS half_avg
        FROM lineitem GROUP BY l_partkey
    ) a ON a_partkey = l_partkey
    WHERE p_brand = 'Brand#13' AND l_quantity < half_avg
    """,
    doc=(
        "TPC-H Q17-style correlated scalar subquery, decorrelated into a "
        "pre-aggregated join (the plan Spark/Catalyst produces anyway)."
    ),
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    avgs = (
        li.groupBy(F.col("l_partkey").alias("a_partkey"))
        .agg((F.lit(0.5) * F.avg("l_quantity")).alias("half_avg"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avgs, li.l_partkey == avgs.a_partkey)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(stable_round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q18_big_orders",
    """
    SELECT o_orderkey, o_custkey, ROUND(SUM(l_quantity), 2) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_custkey
    HAVING SUM(l_quantity) > 150
    """,
    doc="TPC-H Q18-style HAVING filter over a grouped join.",
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(
            F.sum("l_quantity").alias("_raw_qty"),
        )
        .filter(F.col("_raw_qty") > 150)
        .select(
            "o_orderkey", "o_custkey", F.round(F.col("_raw_qty"), 2).alias("total_qty")
        )
    )


@register(
    "q19_disjunctive",
    """
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)) + 5e-7, 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    doc="TPC-H Q19-style OR-of-ANDs join predicate (CNF pushdown exercise).",
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return j.filter(
        arm("Brand#1", 15, 1, 20) | arm("Brand#2", 25, 10, 30) | arm("Brand#3", 35, 20, 40)
    ).agg(
        money_round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue"
        )
    )


# --------------------------------------------------------------------------
# Window function families
# --------------------------------------------------------------------------

@register(
    "q23_rank_family",
    """
    SELECT c_custkey, c_nationkey,
           NTILE(4)       OVER (ORDER BY c_acctbal DESC, c_custkey) AS balance_quartile,
           CAST(RANK()    OVER (PARTITION BY c_nationkey ORDER BY c_mktsegment) AS BIGINT) AS seg_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_mktsegment) AS BIGINT) AS seg_dense_rank,
           ROUND(PERCENT_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal) + 1e-9, 6) AS bal_pct_rank,
           ROUND(CUME_DIST()    OVER (PARTITION BY c_nationkey ORDER BY c_acctbal) + 1e-9, 6) AS bal_cume_dist
    FROM customer
    """,
    doc="ranking family: ntile/rank/dense_rank/percent_rank/cume_dist.",
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    wq = W.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    ws = W.partitionBy("c_nationkey").orderBy("c_mktsegment")
    wb = W.partitionBy("c_nationkey").orderBy("c_acctbal")
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(wq).alias("balance_quartile"),
        F.rank().over(ws).cast("long").alias("seg_rank"),
        F.dense_rank().over(ws).cast("long").alias("seg_dense_rank"),
        stable_round(F.percent_rank().over(wb), 6).alias("bal_pct_rank"),
        stable_round(F.cume_dist().over(wb), 6).alias("bal_cume_dist"),
    )


@register(
    "q24_first_last",
    """
    SELECT DISTINCT o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND UNBOUNDED FOLLOWING) AS last_order,
           COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="first_value/last_value with explicit frames + windowed count.",
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    wall = W.partitionBy("o_custkey")
    return orders.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
        F.count(F.lit(1)).over(wall).alias("n_orders"),
    ).distinct()


@register(
    "q25_percentiles",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5) + 1e-9, 4)  AS median_price,
           ROUND(quantile_cont(l_extendedprice, 0.9) + 1e-9, 4)  AS p90_price,
           ROUND(quantile_cont(l_quantity, 0.25) + 1e-9, 4)      AS q1_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="exact interpolated percentiles per group (sort-based agg).",
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        stable_round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("median_price"),
        stable_round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
        stable_round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("q1_qty"),
    )


# --------------------------------------------------------------------------
# Grouping sets (SQL surface)
# --------------------------------------------------------------------------

@register(
    "q32_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="explicit grouping sets via the SQL surface (same Expand operator).",
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# --------------------------------------------------------------------------
# Scalar families: strings, arrays, null-handling
# --------------------------------------------------------------------------

@register(
    "q53_string_functions",
    """
    SELECT p_partkey,
           SUBSTRING(p_name, 1, 4)                    AS name_prefix,
           REPLACE(p_name, ' ', '_')                  AS snake_name,
           LPAD(CAST(p_partkey AS VARCHAR), 8, '0')   AS padded_key,
           REVERSE(p_brand)                           AS brand_rev,
           CAST(STRPOS(p_name, 'a') AS BIGINT)        AS first_a,
           TRIM(CONCAT('  ', COALESCE(p_type, ''), '  ')) AS trimmed_type,
           LOWER(p_type) || '/' || UPPER(p_brand)     AS mixed_case
    FROM part
    """,
    doc="string scalar family: substring/replace/pad/reverse/locate/trim.",
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.regexp_replace("p_name", " ", "_").alias("snake_name"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.reverse("p_brand").alias("brand_rev"),
        F.instr(F.col("p_name"), "a").cast("long").alias("first_a"),
        # COALESCE inside: Spark's concat propagates a NULL p_type to a
        # NULL result while DuckDB CONCAT skips it (r6 nulls sweep)
        F.trim(
            F.concat(F.lit("  "), F.coalesce("p_type", F.lit("")), F.lit("  "))
        ).alias("trimmed_type"),
        F.concat(F.lower("p_type"), F.lit("/"), F.upper("p_brand")).alias("mixed_case"),
    )


@register(
    "q54_array_functions",
    """
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT)                      AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE) + 1e-9, 5)       AS first_elem,
           ROUND(list_sum(CAST(embedding[1:8] AS DOUBLE[])) + 1e-9, 4) AS head_sum,
           ROUND(list_max(CAST(embedding AS DOUBLE[])) + 1e-9, 5)      AS max_elem
    FROM embeddings
    """,
    doc="array scalar family: length/index/slice/sum/max over embeddings.",
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    dvec = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        # try_element_at / size guard: an empty or NULL vector yields
        # NULL like DuckDB's out-of-bounds index and list_sum([]) — a
        # bare element_at is an ANSI crash (r6 embeddings sweep)
        stable_round(F.try_element_at(dvec, F.lit(1)), 5).alias("first_elem"),
        stable_round(
            F.when(
                F.size(dvec) > 0,
                F.aggregate(F.slice(dvec, 1, 8), F.lit(0.0), lambda a, x: a + x),
            ),
            4,
        ).alias("head_sum"),
        stable_round(F.array_max(dvec), 5).alias("max_elem"),
    )


@register(
    "q55_null_functions",
    """
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           GREATEST(c_acctbal, 0.0)                            AS floored_bal,
           LEAST(c_acctbal, 5000.0)                            AS capped_bal,
           CASE WHEN c_acctbal IS NULL THEN -1.0 ELSE c_acctbal END AS bal_filled
    FROM customer
    """,
    doc="null-handling family: nullif/coalesce/greatest/least/is-null case.",
)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.greatest("c_acctbal", F.lit(0.0)).alias("floored_bal"),
        F.least("c_acctbal", F.lit(5000.0)).alias("capped_bal"),
        F.when(F.col("c_acctbal").isNull(), -1.0).otherwise(F.col("c_acctbal")).alias(
            "bal_filled"
        ),
    )


@register(
    "q57_self_join",
    """
    SELECT a.n_name AS nation_a, b.n_name AS nation_b
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
    doc="self-join: nation pairs within a region (inequality dedup).",
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    a = n.alias("a")
    b = n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(F.col("a.n_name").alias("nation_a"), F.col("b.n_name").alias("nation_b"))


# --------------------------------------------------------------------------
# Approximate aggregates (rows-only: HLL sketches differ across engines)
# --------------------------------------------------------------------------

@register(
    "q26_approx_distinct",
    None,
    doc=(
        "approx_count_distinct (HyperLogLog++); no oracle — sketch "
        "estimates are engine-specific, the driver records rows-only. "
        "Accuracy asserted vs exact counts in tests/test_operators.py."
    ),
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
