"""Query registry backing ``__spark_entry__.py``.

Each registered query is a pair:
- a Spark callable ``(spark, sf_dir) -> DataFrame``
- an optional ANSI-SQL oracle string (DuckDB-runnable on the same parquet
  tables) — ``None`` for genuinely non-SQL-expressible operators, which the
  driver then checks rows-only.

Column-name discipline: the driver sorts columns by name and hash-compares
values, so every computed column is aliased identically in the Spark code
and the oracle SQL.  Float aggregates are rounded (2-6 dp) on BOTH sides so
summation-order differences between Spark partial aggregation and DuckDB
never flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def load_all_modules() -> None:
    """Import every query module so registration side effects run."""
    from sanctum_spark.queries import (  # noqa: F401
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        events_q,
        llm_q,
        spells_q,
        ops_q,
        coverage_q,
        pipeline_q,
        pipeline2_q,
        pipeline3_q,
        pipeline4_q,
        pipeline5_q,
        pipeline6_q,
        pipeline7_q,
    )


# Driver-verification rotation.  The driver's correctness gate checks the
# FIRST 50 entries of ``queries()`` (observed: CORRECTNESS_r01–r06 each
# contain exactly the first 50 registry keys in insertion order).  With 159
# registered queries a fixed order would leave the tail permanently
# unverified, so each round the front slots rotate.
#
# STANDING POLICY (from the r6 verdict, task #1): OLDEST-FIRST.  Each round,
# fill the 50 slots with the queries whose most recent driver CORRECTNESS
# row is oldest; tie-break toward queries whose shared operators or oracle
# helpers changed since their last driver row.  The registry is frozen at
# 159 (r6 verdict task #6), so the rotation cycles the whole surface every
# ~3 rounds.
#
# Round 9 selection (last-driver-round census over CORRECTNESS_r01-r08:
# r05x12, r06x48, r07x49, r08x50 - verified at round start):
#   1. the 12 queries whose last driver row is r05 - now three rounds of
#      code motion since their last external check, explicitly queued by
#      the r8 verdict (task #1): q29/q35-q39 (TPC-H-ish aggregates),
#      q66/q69 (scalar fns), q87/q88 (aggregate fns), q96/q103
#      (array/map higher-order scalars, deferred from the r8 front-50);
#   2. 38 of the 48 r06-era queries, oldest-first with the verdict's
#      named priorities (q131, q141, q149-q151, q153-q157, q162-q164,
#      the q01/q02/q30 aggregate family) plus the tie-break rule:
#      q50_scalar_functions's oracle moved to money_round pins in r8
#      (the ROUND(double) shortest-decimal divergence, batch 15), so its
#      next driver row must cover the new pin.
#   Deferred to r10 (10 r06-era relational rows, each with r7/r8-green
#   same-family siblings): q06/q14 (TPC-H filters ~ q17-q19 r7-green),
#   q10/q11/q12 (join variants ~ q44/q45 r8, q57/q63 r7), q23/q25
#   (window/percentile ~ q21/q22/q24 r7, q148 r8), q33/q43 (array ops ~
#   q133 r8, q97 r8), q52 (sort/limit ~ q113 r8).
# After this round every query's most recent driver row is r7+ - the
# staleness floor the r8 verdict asked for.
# The FULL registry is still verified every round locally via
# ``tools/verify_local.py`` (driver-strength string compare since r6),
# so rotation never substitutes for whole-surface checking.
VERIFY_FIRST: list[str] = [
    # --- 1. last driver row r05 (stalest external evidence) ---
    "q29_min_cost_supplier",
    "q35_returned_revenue",
    "q36_important_parts",
    "q37_ship_delay_buckets",
    "q38_excess_volume_suppliers",
    "q39_last_shipper",
    "q66_exists_sql",
    "q69_date_arithmetic",
    "q87_approx_percentile",
    "q88_user_correlation",
    "q96_array_higher_order",
    "q103_map_zip_with",
    # --- 2. r06-era: TPC-H-ish relational backfill ---
    "q01_pricing_summary",
    "q02_distinct_counts",
    "q03_shipping_priority",
    "q04_order_priority",
    "q05_local_supplier_volume",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q13_range_join",
    "q15_top_supplier",
    "q16_supplier_counts",
    "q27_cust_order_distribution",
    "q28_above_avg_no_orders",
    # --- 2. r06-era: grouping/rollup/window family ---
    "q20_topk_per_group",
    "q26_approx_distinct",
    "q30_rollup",
    "q31_cube",
    "q32_grouping_sets",
    # --- 2. r06-era: set ops / scalar fns (q50: r8 money_round pin) ---
    "q34_unpivot",
    "q40_set_ops",
    "q50_scalar_functions",
    "q51_date_functions",
    "q54_array_functions",
    "q59_scalar_subquery",
    "q68_regexp_extract",
    # --- 2. r06-era: pipeline/profiling/privacy backfill ---
    "q131_incremental_agg",
    "q141_mix_entropy",
    "q149_scd2_intervals",
    "q150_psi_drift",
    "q151_chi2_independence",
    "q153_dtw_similarity",
    "q154_benford_digits",
    "q155_weighted_reservoir",
    "q156_powerlaw_fit",
    "q157_shard_manifest",
    "q162_bm25_topk",
    "q163_k_anonymity",
    "q164_l_diversity",
]


def _ordered() -> list[Query]:
    load_all_modules()
    front = [REGISTRY[n] for n in VERIFY_FIRST if n in REGISTRY]
    missing = [n for n in VERIFY_FIRST if n not in REGISTRY]
    if missing:
        raise KeyError(f"VERIFY_FIRST names not in registry: {missing}")
    rest = [q for q in REGISTRY.values() if q.name not in set(VERIFY_FIRST)]
    return front + rest


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}
