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
# Round 12 selection (last-driver-round census over CORRECTNESS_r01-r11:
# r08x9, r09x50, r10x50, r11x50 - verified at round start; r11 verdict
# task #1 orders this rotation explicitly):
#   1. the 9 r8-era rows deferred by the r11 rotation (named in the r11
#      verdict): q74/q75/q78/q94/q119/q121/q129/q143 (the rows-only
#      approximate families) plus q99_dedup_clusters - four rounds since
#      their last external check, now the staleness floor;
#   2. 41 of the 50 r09-era queries.  All 50 tie on staleness, so the
#      standing tie-break applies: defer the 9 with the strongest
#      independent in-suite evidence:
#        - q26_approx_distinct / q87_approx_percentile: the only two
#          rows-only rows in the r9 cohort (the driver can only count
#          rows for them) and each carries an in-suite accuracy pin;
#        - q150/q151/q154/q156 (PSI / chi-square / Benford / power-law):
#          closed-form edge pins (tests/test_edge_invariants.py:182,253,
#          276,317 - identical-periods-zero, independence-zero, boundary
#          digits, perfect-fit R^2=1);
#        - q153 (DTW): full-matrix-equality + symmetry/band property fuzz
#          plus a driver-side numpy reference replay
#          (tests/test_operators.py:1030,1050,1275);
#        - q155 (weighted reservoir): weight/tie semantics pin + group-
#          limit plan pin (tests/test_edge_invariants.py:290,
#          tests/test_plans.py:468);
#        - q162 (BM25): dedicated parameter-fuzz family K
#          (tools/param_fuzz.py).
#      Rotating the remaining oracle-paired rows in ahead of these
#      maximizes the external evidence the 50 driver slots buy.
# After this round the staleness floor is r9 with only those 9 rows on
# it; they are the r13 front-50 seed.
# The FULL registry is still verified every round locally via
# ``tools/verify_local.py`` (driver-strength string compare since r6),
# so rotation never substitutes for whole-surface checking.
VERIFY_FIRST: list[str] = [
    # --- 1. last driver row r08 (stalest external evidence) ---
    "q74_minhash_lsh_pairs",
    "q75_simhash_pairs",
    "q78_ann_lsh_topk",
    "q94_ann_ivf",
    "q99_dedup_clusters",
    "q119_pq_ann",
    "q121_cross_corpus_neardup",
    "q129_bpe_vocab",
    "q143_compression_ratio",
    # --- 2. r09-era: TPC-H relational core ---
    "q01_pricing_summary",
    "q02_distinct_counts",
    "q03_shipping_priority",
    "q04_order_priority",
    "q05_local_supplier_volume",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q15_top_supplier",
    "q16_supplier_counts",
    "q20_topk_per_group",
    "q27_cust_order_distribution",
    "q28_above_avg_no_orders",
    "q29_min_cost_supplier",
    "q35_returned_revenue",
    "q36_important_parts",
    "q37_ship_delay_buckets",
    "q38_excess_volume_suppliers",
    "q39_last_shipper",
    # --- 2. r09-era: grouping / set / reshape ---
    "q30_rollup",
    "q31_cube",
    "q32_grouping_sets",
    "q34_unpivot",
    "q40_set_ops",
    # --- 2. r09-era: scalar / array / map / subquery surface ---
    "q50_scalar_functions",
    "q51_date_functions",
    "q54_array_functions",
    "q59_scalar_subquery",
    "q66_exists_sql",
    "q68_regexp_extract",
    "q69_date_arithmetic",
    "q96_array_higher_order",
    "q103_map_zip_with",
    # --- 2. r09-era: joins / incremental / pipeline ---
    "q13_range_join",
    "q88_user_correlation",
    "q131_incremental_agg",
    "q141_mix_entropy",
    "q149_scd2_intervals",
    "q157_shard_manifest",
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
