"""Third batch: remaining TPC-H query shapes (adapted to the synthetic
schema), lateral/explode, unpivot, join-strategy hints, correlated and
scalar subqueries via the SQL surface.

Same cross-engine conventions as relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sanctum_spark.io import load_table, register_views
from sanctum_spark.queries import register
from sanctum_spark.queries.util import money_round, stable_round


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q04_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4-style correlated EXISTS → left-semi join.",
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    # r14 (guide 2.3, aggregate before you shuffle): EXISTS(l_shipdate >
    # o_orderdate) is exactly MAX(l_shipdate) > o_orderdate, and the max
    # partially aggregates map-side. At bench SF the old semi join
    # broadcast ALL of lineitem as the build side (plan: BHJ LeftSemi
    # BuildRight); now the small date-filtered orders slice is the
    # broadcast and lineitem reduces to one narrow row per order before
    # any join. Past broadcast size both forms shuffle on l_orderkey,
    # where the pre-agg ships ~1/4 the rows at ~1/5 the width. The join
    # stays 1:1 per order, so the count is the semi-join count.
    # Paired A/B median 0.79 over 12 pairs; output identical; oracle PASS.
    li_max = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("mx"))
    j = orders.join(
        li_max,
        (orders.o_orderkey == li_max.l_orderkey)
        & (li_max.mx > orders.o_orderdate),
    )
    return j.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q07_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(volume) + 5e-7, 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name IN ('NATION_1', 'NATION_2')
          AND n2.n_name IN ('NATION_1', 'NATION_2')
          AND n1.n_name <> n2.n_name
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7-style two-nation trade volume by year.",
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").alias("n1")
    n2 = _t(spark, sf_dir, "nation").alias("n2")
    nations = ["NATION_1", "NATION_2"]
    j = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2.n_nationkey"))
        .filter(
            F.col("n1.n_name").isin(nations)
            & F.col("n2.n_name").isin(nations)
            & (F.col("n1.n_name") != F.col("n2.n_name"))
        )
    )
    return (
        j.select(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(money_round(F.sum("volume")).alias("revenue"))
    )


@register(
    "q08_market_share",
    """
    SELECT o_year,
           ROUND(SUM(CASE WHEN p_brand = 'Brand#1' THEN volume ELSE 0 END)
                 / SUM(volume) + 1e-9, 6) AS brand_share
    FROM (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               p_brand
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part   ON l_partkey = p_partkey
    ) v
    GROUP BY o_year
    """,
    doc="TPC-H Q8-style market-share ratio per year.",
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "p_brand",
        )
    )
    return j.groupBy("o_year").agg(
        stable_round(
            F.sum(F.when(F.col("p_brand") == "Brand#1", F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            6,
        ).alias("brand_share")
    )


@register(
    "q09_product_profit",
    """
    SELECT n_name AS nation, o_year, ROUND(SUM(amount) + 5e-7, 2) AS profit
    FROM (
        SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity AS amount
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN part     ON p_partkey = l_partkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY n_name, o_year
    """,
    doc="TPC-H Q9-style product profit by nation/year (LIKE filter).",
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    orders = _t(spark, sf_dir, "orders")
    nat = _t(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    )
    j = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
    )
    return j.groupBy("nation", "o_year").agg(money_round(F.sum("amount")).alias("profit"))


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(SUM(l_extendedprice * (1 - l_discount)) + 5e-7, 2) AS total_revenue
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15-style: CTE + scalar MAX subquery for the top supplier.",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        money_round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        supp.join(rev, supp.s_suppkey == rev.supplier_no)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_counts",
    """
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_size IN (1, 5, 10, 15, 20, 25)
    GROUP BY p_brand, p_size
    """,
    doc="TPC-H Q16-style distinct-supplier counts with NOT/IN predicates.",
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin([1, 5, 10, 15, 20, 25])
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q27_cust_order_distribution",
    """
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
        SELECT c_custkey, COALESCE(cnt, 0) AS n_orders
        FROM customer
        LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) o
          ON c_custkey = o_custkey
    ) t
    GROUP BY n_orders
    """,
    doc="TPC-H Q13-style distribution-of-counts (double aggregation).",
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    cnts = _t(spark, sf_dir, "orders").groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        cust.join(cnts, cust.c_custkey == cnts.o_custkey, "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "q28_above_avg_no_orders",
    """
    SELECT c_nationkey, COUNT(*) AS n_cust, ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22-style: scalar AVG subquery + anti join.",
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "q33_explode_positions",
    """
    SELECT CAST(i AS INT) AS pos,
           ROUND(AVG(CAST(embedding[i] AS DOUBLE)) + 1e-9, 5) AS avg_v,
           -- COUNT(col), not COUNT(*): vectors shorter than i (or NULL)
           -- have no element there, matching Spark's posexplode which
           -- emits no row for a missing position (r6 embeddings sweep)
           COUNT(embedding[i]) AS n
    FROM embeddings, (SELECT UNNEST([1, 2, 3, 4]) AS i) p
    GROUP BY i
    """,
    doc="lateral explode (posexplode) of an array column + positional agg.",
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    head = F.slice(F.transform("embedding", lambda x: x.cast("double")), 1, 4)
    return (
        emb.select(F.posexplode(head).alias("pos0", "v"))
        .select((F.col("pos0") + 1).cast("int").alias("pos"), "v")
        .groupBy("pos")
        .agg(stable_round(F.avg("v"), 5).alias("avg_v"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "q34_unpivot",
    """
    SELECT l_returnflag, measure, ROUND(total, 2) AS total
    FROM (
        SELECT l_returnflag, 'qty' AS measure, SUM(l_quantity) AS total
        FROM lineitem GROUP BY l_returnflag
        UNION ALL
        SELECT l_returnflag, 'price', SUM(l_extendedprice) FROM lineitem GROUP BY l_returnflag
        UNION ALL
        SELECT l_returnflag, 'tax', SUM(l_tax) FROM lineitem GROUP BY l_returnflag
    ) u
    """,
    doc="unpivot/melt of per-group aggregates to (measure, value) rows.",
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("qty"),
        F.sum("l_extendedprice").alias("price"),
        F.sum("l_tax").alias("tax"),
    )
    return agg.unpivot(
        ["l_returnflag"], ["qty", "price", "tax"], "measure", "raw"
    ).select("l_returnflag", "measure", F.round("raw", 2).alias("total"))


@register(
    "q42_union_by_name",
    """
    SELECT c_custkey AS entity_id, c_acctbal AS balance, 'customer' AS kind FROM customer
    UNION ALL BY NAME
    SELECT 'supplier' AS kind, s_acctbal AS balance, s_suppkey AS entity_id FROM supplier
    """,
    doc="unionByName with reordered columns across heterogeneous sources.",
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_acctbal").alias("balance"),
        F.lit("customer").alias("kind"),
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_acctbal").alias("balance"),
        F.col("s_suppkey").alias("entity_id"),
    )
    return cust.unionByName(supp)


@register(
    "q58_sort_merge_hint",
    """
    SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
    doc=(
        "join-strategy hint surface: force a shuffled sort-merge join "
        "(what Catalyst picks anyway once both sides exceed the broadcast "
        "threshold at real scale)."
    ),
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").hint("merge")
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


@register(
    "q59_scalar_subquery",
    """
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice > 1.5 * (SELECT AVG(p_retailprice) FROM part)
    """,
    doc="scalar subquery predicate via the SQL surface.",
)
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_retailprice > 1.5 * (SELECT AVG(p_retailprice) FROM part)
        """
    )


@register(
    "q66_exists_sql",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_suppkey = s_suppkey AND l_quantity > 49
    )
    """,
    doc="correlated EXISTS through the SQL surface (Catalyst decorrelates).",
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_suppkey = s_suppkey AND l_quantity > 49
        )
        """
    )
