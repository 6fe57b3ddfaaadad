"""Batch relational surface (SURVEY.md §2.3) as (Spark, DuckDB-oracle) pairs.

Conventions making the hash-compare robust across engines:
- every computed column aliased identically on both sides;
- float aggregates rounded (2 dp money, 4 dp averages) on both sides so
  summation-order differences never flip the hash;
- DuckDB integer SUM returns HUGEINT → always ``CAST(SUM(..) AS BIGINT)``
  in oracles; Spark integer sums are already LongType;
- DuckDB ``year()`` returns BIGINT → Spark side casts to long;
- every LIMIT/top-k query carries a full deterministic ORDER BY with a
  unique tiebreaker column.

Scale notes (100 TB): filters are expressed on the scan column directly so
they push into the parquet reader; small dims (region/nation/customer/part/
supplier) are broadcast explicitly; large-large joins shuffle on their keys
and rely on AQE for skew; no driver-side collects anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from sanctum_spark.io import load_table
from sanctum_spark.queries import register
from sanctum_spark.queries.util import money_round, sql_money_round, stable_round


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregation
# --------------------------------------------------------------------------

@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)) + 5e-7, 2)         AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) + 5e-7, 2) AS sum_charge,
           ROUND(AVG(l_quantity) + 1e-9, 4)                                 AS avg_qty,
           ROUND(AVG(l_extendedprice) + 1e-9, 4)                            AS avg_price,
           ROUND(AVG(l_discount) + 1e-9, 4)                                 AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: scan + pushed filter + hash agg.",
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        money_round(F.sum(disc_price)).alias("sum_disc_price"),
        money_round(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
        stable_round(F.avg("l_quantity"), 4).alias("avg_qty"),
        stable_round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        stable_round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q02_distinct_counts",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey)   AS n_parts,
           COUNT(DISTINCT l_suppkey)   AS n_supps,
           COUNT(*)                    AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="count-distinct per group (expand-based distinct agg in Spark).",
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q03_shipping_priority",
    """
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)) + 5e-7, 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-style: broadcast dim join + agg + deterministic top-k.",
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            money_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q05_local_supplier_volume",
    """
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)) + 5e-7, 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    doc="TPC-H Q5-style 6-way join; dims broadcast, fact-fact shuffle join.",
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            money_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Join varieties
# --------------------------------------------------------------------------

@register(
    "q10_semi_join",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    )
    """,
    doc="left-semi join (EXISTS).",
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q11_anti_join",
    """
    SELECT c_custkey, c_name
    FROM customer
    -- NOT EXISTS, not NOT IN: a single NULL o_custkey makes NOT IN
    -- return ZERO rows under three-valued logic, while Spark's
    -- left_anti (and NOT EXISTS) simply never matches the NULL key
    -- (r6 relational-nulls sweep)
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey)
    """,
    doc="left-anti join (NOT EXISTS); customers with no orders.",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q12_outer_join_fill",
    """
    SELECT c_custkey,
           COALESCE(cnt, 0)                 AS n_orders,
           ROUND(COALESCE(total, 0.0), 2)   AS total_spent
    FROM customer
    LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS cnt, SUM(o_totalprice) AS total
        FROM orders GROUP BY o_custkey
    ) agg ON c_custkey = o_custkey
    """,
    doc="left-outer join against a pre-aggregated fact (agg pushed below join).",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    agg = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("o_totalprice").alias("total"))
    )
    return cust.join(agg, cust.c_custkey == agg.o_custkey, "left").select(
        "c_custkey",
        F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"),
        F.round(F.coalesce(F.col("total"), F.lit(0.0)), 2).alias("total_spent"),
    )


@register(
    "q13_range_join",
    """
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate > o_orderdate
     AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority
    """,
    doc="range/interval join: equi-key plus time-band predicate.",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > orders.o_orderdate)
        & (li.l_shipdate <= orders.o_orderdate + F.expr("INTERVAL 90 DAYS"))
    )
    return (
        orders.join(li, cond)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# Window functions / top-k
# --------------------------------------------------------------------------

@register(
    "q20_topk_per_group",
    """
    SELECT c_nationkey, c_custkey, c_acctbal
    FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey
               ) AS rn
        FROM customer
    ) t
    WHERE rn <= 3
    """,
    doc="per-group top-k via ranking window; one shuffle on the group key.",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        _t(spark, sf_dir, "customer")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


@register(
    "q21_window_running",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_spend,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS order_seq
    FROM orders
    """,
    doc="running aggregate + row_number over the same window spec.",
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
            2,
        ).alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "q22_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                LAG(o_orderdate) OVER (
                    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    """,
    doc="lag/lead navigation + date arithmetic.",
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).cast("long").alias("days_since_prev"),
    )


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube
# --------------------------------------------------------------------------

@register(
    "q30_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc=(
        "rollup hierarchy totals (Expand operator in Spark). Known "
        "engine divergence on EMPTY input only (q31/q32 likewise): the "
        "SQL standard's () grouping set yields one grand-total row "
        "(COUNT 0) on an empty table — DuckDB emits it, Spark's "
        "rollup/cube/groupingSets emit zero rows. Documented, pinned in "
        "tests/test_empty_input.py; irrelevant on any non-empty input."
    ),
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "q31_cube",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="cube over two dims.",
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("sum_price"))
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

@register(
    "q40_set_ops",
    """
    SELECT o_custkey FROM orders WHERE o_totalprice > 200000
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="intersect (distinct set semantics).",
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 200000).select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@register(
    "q41_except_union",
    """
    SELECT x.o_custkey FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ) x
    UNION ALL
    SELECT -1 AS o_custkey
    """,
    doc="except + union-all with a literal relation.",
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    lit = spark.createDataFrame([(-1,)], "o_custkey long")
    # subtract == SQL EXCEPT (distinct set semantics); exceptAll would be
    # the multiset variant and over-retain duplicated keys.
    return a.subtract(b).unionByName(lit)


# --------------------------------------------------------------------------
# Scalar function surface
# --------------------------------------------------------------------------

@register(
    "q50_scalar_functions",
    f"""
    SELECT p_partkey,
           UPPER(p_brand)                                   AS brand_upper,
           LENGTH(p_name)                                   AS name_len,
           -- COALESCE inside: DuckDB CONCAT skips NULL args while
           -- Spark's concat propagates NULL and concat_ws drops the
           -- separator — explicit '' pins ':' on both engines
           CONCAT(COALESCE(p_brand, ''), ':', COALESCE(p_type, '')) AS brand_type,
           -- money_round (5e-7 eps, both sides): a 2-decimal price x 1.1
           -- lands exactly on .xx5 boundaries, where bare ROUND diverges
           -- cross-engine (Spark rounds the shortest decimal repr via
           -- BigDecimal, DuckDB the binary expansion — r8 fuzz seed 7)
           {sql_money_round('p_retailprice * 1.1')}         AS taxed_price,
           CAST(FLOOR(p_size / 10.0) AS BIGINT)             AS size_bucket,
           CASE WHEN p_size >= 25 THEN 'large'
                WHEN p_size >= 10 THEN 'medium'
                ELSE 'small' END                            AS size_class
    FROM part
    """,
    doc="string/math/conditional scalar functions (whole-stage codegen path).",
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.concat(
            F.coalesce("p_brand", F.lit("")),
            F.lit(":"),
            F.coalesce("p_type", F.lit("")),
        ).alias("brand_type"),
        money_round(F.col("p_retailprice") * 1.1).alias("taxed_price"),
        F.floor(F.col("p_size") / 10.0).cast("long").alias("size_bucket"),
        F.when(F.col("p_size") >= 25, "large")
        .when(F.col("p_size") >= 10, "medium")
        .otherwise("small")
        .alias("size_class"),
    )


@register(
    "q51_date_functions",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT)    AS order_year,
           CAST(month(o_orderdate) AS BIGINT)   AS order_month,
           COUNT(*)                             AS n_orders,
           ROUND(SUM(o_totalprice), 2)          AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
    doc="date part extraction + agg (partition-pruning-shaped query).",
)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@register(
    "q52_sort_limit",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    doc="global top-k: Spark TakeOrderedAndProject (no full sort).",
)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )
