"""Plan-quality regression tests: the physical plans that make the
100 TB story true, asserted so a refactor can't silently lose them."""

from __future__ import annotations

import pytest

import sanctum_spark.queries as qreg

qreg.load_all_modules()


def plan_of(spark, sf_dir, name: str) -> str:
    df = qreg.REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_filter_pushed_and_columns_pruned(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # 7 of 11 lineitem columns read — projection reaches the scan
    assert "ReadSchema: struct<l_quantity:double,l_extendedprice:double" in plan
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_q03_broadcast_joins_and_topk(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q03_shipping_priority")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_q05_dims_all_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q05_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 5


def test_q52_global_topk_no_full_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q52_sort_limit")
    assert "TakeOrderedAndProject" in plan
    # no global Sort node — losers never shuffle
    assert "Exchange rangepartitioning" not in plan


def test_q06_scan_only_needed_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q06_revenue_filter")
    assert "PushedFilters" in plan
    read = plan.split("ReadSchema")[1]
    for col in ["l_orderkey", "l_partkey", "l_returnflag"]:
        assert col not in read[:400]


def test_q10_semi_join_stays_semi(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q10_semi_join")
    assert "LeftSemi" in plan


def test_q73_query_vector_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q73_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


def test_whole_stage_codegen_active(spark, sf_dir):
    import contextlib
    import io

    df = qreg.REGISTRY["q01_pricing_summary"].fn(spark, sf_dir)
    df.collect()  # AQE: codegen subtrees exist only in the final plan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    out = buf.getvalue()
    # "Found N WholeStageCodegen subtrees" with N >= 2 (scan+partial agg,
    # final agg) — the whole pipeline stays inside generated code
    assert "WholeStageCodegen subtrees" in out
    n = int(out.split("Found ")[1].split(" ")[0])
    assert n >= 2
