"""Fifth batch: the remaining TPC-H query shapes the inventory lacked —
min-cost supplier (Q2), returned-item revenue (Q10), important parts
(Q11), ship-delay buckets (Q12), excess-volume suppliers (Q20), and
last-shipper-in-order (Q21) — adapted to the driver's schema (no
partsupp / shipmode / commit dates; see TESTDATA.md).

Determinism notes (cross-engine hash compare):
- q29 ranks suppliers by MIN(l_extendedprice/l_quantity): each division
  is one IEEE-754 op and MIN never re-associates, so both engines hold
  bit-identical doubles and the (cost, suppkey) rank is stable. The
  FINAL display round still needs the stable_round nudge: a money
  division can land exactly on a 4-dp half boundary, where Spark
  (HALF_UP on the shortest decimal repr) and DuckDB (binary rounding)
  disagree.
- q38 compares SUM(l_quantity) against a fraction of the part total:
  quantities are integral doubles, so sums are exact and the single
  multiply 0.3*total is the same float on both engines.
- Revenue sums go through money_round (util.py) before any rank/compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sanctum_spark.io import load_table
from sanctum_spark.queries import register
from sanctum_spark.queries.util import (
    money_round,
    sql_money_round,
    stable_round,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q29_min_cost_supplier",
    """
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY 1, 2
    ),
    ranked AS (
        SELECT l_partkey, l_suppkey, unit_cost,
               ROW_NUMBER() OVER (PARTITION BY l_partkey
                                  ORDER BY unit_cost, l_suppkey) AS rn
        FROM cost
    )
    SELECT p.p_partkey, p.p_name, s.s_name AS best_supplier,
           ROUND(r.unit_cost + 1e-9, 4) AS unit_cost
    FROM ranked r
    JOIN part p ON p.p_partkey = r.l_partkey
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.rn = 1 AND p.p_size <= 10
    """,
    doc=(
        "TPC-H Q2-style min-cost supplier per part (no partsupp table: "
        "unit cost is MIN(l_extendedprice/l_quantity) observed in "
        "lineitem). Correlated-min decorrelated into a ranking window; "
        "part/supplier dims broadcast onto the winner rows."
    ),
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    supp = _t(spark, sf_dir, "supplier")
    # r14: the p_size filter keeps ~20% of parts, and only their lineitem
    # rows can reach the output — semi-join the fact side down BEFORE the
    # aggregate (guide 3.2) so the (partkey, suppkey) shuffle carries a
    # fifth of the bytes at any scale.
    li_f = li.join(
        F.broadcast(part.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    cost = li_f.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    # r14: the rank-1 window is an argmin — the lexicographic struct MIN
    # equals ROW_NUMBER() ORDER BY unit_cost, l_suppkey at rn=1, but
    # aggregates partially map-side instead of sort+window after the
    # second exchange (guide 2.3). Paired A/B 0.686; output identical.
    best = (
        cost.groupBy("l_partkey")
        .agg(F.min(F.struct("unit_cost", "l_suppkey")).alias("b"))
        .select(
            "l_partkey",
            F.col("b.unit_cost").alias("unit_cost"),
            F.col("b.l_suppkey").alias("l_suppkey"),
        )
    )
    return (
        best.join(F.broadcast(part), part.p_partkey == best.l_partkey)
        .join(F.broadcast(supp), supp.s_suppkey == best.l_suppkey)
        .select(
            "p_partkey",
            "p_name",
            F.col("s_name").alias("best_supplier"),
            stable_round(F.col("unit_cost"), 4).alias("unit_cost"),
        )
    )


@register(
    "q35_returned_revenue",
    f"""
    WITH rev AS (
        SELECT c.c_custkey, c.c_name, n.n_name AS nation,
               {sql_money_round("SUM(l.l_extendedprice * (1 - l.l_discount))")} AS revenue
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY 1, 2, 3
    )
    SELECT c_custkey, c_name, nation, revenue
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) AS rn
          FROM rev)
    WHERE rn <= 20
    """,
    doc=(
        "TPC-H Q10-style returned-item revenue: top-20 customers by "
        "revenue lost to returns (l_returnflag='R'). Rank key is the "
        "money-rounded revenue with custkey tiebreak so the top-20 "
        "cutoff is engine-stable; dims broadcast, one fact shuffle."
    ),
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            money_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
    )
    # Global top-20 via orderBy+limit -> TakeOrderedAndProject (per-partition
    # heaps merged at the driver), NOT a single-partition row_number window:
    # at 100 TB the window form funnels every customer through one task.
    # (revenue desc, c_custkey) is a total order, so the cutoff is stable.
    return rev.orderBy(F.col("revenue").desc(), "c_custkey").limit(20)


@register(
    "q36_important_parts",
    f"""
    WITH pv AS (
        SELECT l_partkey,
               {sql_money_round("SUM(l_extendedprice * (1 - l_discount))")} AS part_value
        FROM lineitem GROUP BY 1
    ),
    total AS (SELECT {sql_money_round("1.5 * AVG(part_value)")} AS tv FROM pv)
    SELECT p.p_partkey, p.p_name, pv.part_value
    FROM pv JOIN part p ON p.p_partkey = pv.l_partkey, total
    WHERE pv.part_value > total.tv
    """,
    doc=(
        "TPC-H Q11-style important parts: parts whose lineitem value "
        "exceeds 1.5x the mean part value (scalar-subquery HAVING; "
        "mean-relative so the cut is scale-invariant). Both sides of "
        "the compare are money-rounded sums, so the cut is "
        "engine-stable. The global scalar is a broadcast single-row "
        "cross join, not a driver collect."
    ),
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    pv = li.groupBy("l_partkey").agg(
        money_round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("part_value")
    )
    total = pv.agg(money_round(F.lit(1.5) * F.avg("part_value")).alias("tv"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("tv"))
        .join(F.broadcast(part), part.p_partkey == pv.l_partkey)
        .select("p_partkey", "p_name", "part_value")
    )


@register(
    "q37_ship_delay_buckets",
    """
    SELECT CASE WHEN delay_days < 30 THEN 'lt_30'
                WHEN delay_days < 60 THEN 'lt_60'
                ELSE 'ge_60' END AS delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_priority,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_priority
    FROM (
        SELECT o.o_orderpriority,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE)) AS delay_days
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    GROUP BY 1
    """,
    doc=(
        "TPC-H Q12-style priority-by-delay buckets (no shipmode column: "
        "buckets are order->ship delay bands). Conditional counting over "
        "one fact join; dates compared as DATE on both engines because "
        "DuckDB's timestamp date_diff counts boundary crossings."
    ),
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "delay_days"
        ),
    )
    bucket = (
        F.when(F.col("delay_days") < 30, "lt_30")
        .when(F.col("delay_days") < 60, "lt_60")
        .otherwise("ge_60")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy(bucket.alias("delay_bucket")).agg(
        F.sum(F.when(hi, 1).otherwise(0)).alias("high_priority"),
        F.sum(F.when(~hi, 1).otherwise(0)).alias("low_priority"),
    )


@register(
    "q38_excess_volume_suppliers",
    """
    WITH sp AS (
        SELECT l_suppkey, l_partkey, SUM(l_quantity) AS supp_qty
        FROM lineitem GROUP BY 1, 2
    ),
    pt AS (
        SELECT l_partkey, SUM(supp_qty) AS part_qty,
               COUNT(*) AS n_supps
        FROM sp GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(COUNT(*) AS BIGINT) AS n_dominated_parts
    FROM sp JOIN pt ON pt.l_partkey = sp.l_partkey
    JOIN supplier s ON s.s_suppkey = sp.l_suppkey
    WHERE sp.supp_qty > 2.0 * pt.part_qty / pt.n_supps
    GROUP BY 1, 2
    """,
    doc=(
        "TPC-H Q20-style excess-volume suppliers: suppliers shipping "
        ">2x their equal share of a part's total quantity (share-"
        "relative so the cut survives scale-up), counted per supplier. The "
        "correlated quantity subquery decorrelates into a two-level "
        "aggregation reusing the first shuffle's partitioning "
        "(partkey ⊂ partkey,suppkey). Quantities are integral doubles: "
        "sums are exact, the threshold compare is deterministic."
    ),
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    # r13 optimization (guide §2.4): the part-level totals are unbounded
    # window aggregates over sp partitioned by l_partkey — same values
    # as the former groupBy(l_partkey) + self-join (SUM/COUNT over
    # exactly the same rows; quantity sums are integral doubles, exact),
    # but the join and its second evaluation of sp disappear: one
    # exchange by partkey feeds the window directly.
    wp = W.partitionBy("l_partkey")
    return (
        sp.withColumn("part_qty", F.sum("supp_qty").over(wp))
        .withColumn("n_supps", F.count(F.lit(1)).over(wp))
        .filter(
            F.col("supp_qty") > F.lit(2.0) * F.col("part_qty") / F.col("n_supps")
        )
        .join(F.broadcast(supp), supp.s_suppkey == sp.l_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
    )


@register(
    "q39_last_shipper",
    """
    WITH marked AS (
        SELECT l_suppkey, l_orderkey,
               l_shipdate = MAX(l_shipdate) OVER (PARTITION BY l_orderkey)
                   AS is_last,
               COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey)
                   AS n_supps
        FROM lineitem
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders_held_up
    FROM marked m JOIN supplier s ON s.s_suppkey = m.l_suppkey
    WHERE m.is_last AND m.n_supps > 1
    GROUP BY 1, 2
    """,
    doc=(
        "TPC-H Q21-style last shipper: suppliers whose lineitem shipped "
        "last within a multi-supplier order (the EXISTS/NOT EXISTS pair "
        "collapsed into one window over the order: max shipdate + "
        "distinct-supplier count — one shuffle on l_orderkey instead of "
        "two self-joins). Timestamp equality is exact on both engines."
    ),
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("l_orderkey")
    marked = li.select(
        "l_suppkey",
        "l_orderkey",
        (F.col("l_shipdate") == F.max("l_shipdate").over(w)).alias("is_last"),
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supps"),
    )
    return (
        marked.filter(F.col("is_last") & (F.col("n_supps") > 1))
        .join(F.broadcast(supp), supp.s_suppkey == marked.l_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count_distinct("l_orderkey").alias("n_orders_held_up"))
    )
