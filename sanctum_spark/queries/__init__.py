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
# Round 13 selection (last-driver-round census over CORRECTNESS_r01-r12:
# r09x9, r10x50, r11x50, r12x50 - recomputed at round start and matching
# the r12 verdict's census exactly; r12 verdict task #1 orders this
# rotation explicitly):
#   1. the 9 rows the r12 rotation deferred, now alone on the r9
#      staleness floor: q26/q87 (the rows-only approx pair) and
#      q150/q151/q153/q154/q155/q156/q162 (the closed-form-pinned
#      statistical validators + DTW + weighted reservoir + BM25);
#   2. 41 of the 50 r10-era queries.  All 50 tie on staleness, so the
#      standing tie-break applies: defer the 9 with the strongest
#      independent in-suite evidence, favoring rows whose operators are
#      also exercised by fuzz families or byte-identity pins:
#        - q70_exact_dedup / q91_ngram_jaccard: bit-identity fuzz
#          families A/G (tools/param_fuzz.py) re-run every round;
#        - q71_text_stats / q72_lang_quality / q76_quality_profile /
#          q92_corpus_clean: pure JVM expression pipelines whose scalar
#          kernels are covered by the r10-era oracle rows AND the fused-
#          pipeline equality suite (fuzz family O);
#        - q73_cosine_topk: numpy-replay fuzz family D;
#        - q86_event_sequence: stream-stream-join-equals-batch-CEP pin
#          (tests/test_streaming_joins.py:32);
#        - q89_dispersion: degenerate-group closed-form pin
#          (tests/test_edge_invariants_b8.py:48) + boundary family
#          (tests/test_edge_invariants_b13.py:72).
#      Those 9 roll to the r14 front-50 seed (then on the r10 floor).
# The FULL registry is still verified every round locally via
# ``tools/verify_local.py`` (driver-strength string compare since r6),
# so rotation never substitutes for whole-surface checking.
VERIFY_FIRST: list[str] = [
    # --- 1. last driver row r09 (stalest external evidence) ---
    "q26_approx_distinct",
    "q87_approx_percentile",
    "q150_psi_drift",
    "q151_chi2_independence",
    "q153_dtw_similarity",
    "q154_benford_digits",
    "q155_weighted_reservoir",
    "q156_powerlaw_fit",
    "q162_bm25_topk",
    # --- 2. r10-era: relational / join / scalar core ---
    "q06_revenue_filter",
    "q10_semi_join",
    "q11_anti_join",
    "q12_outer_join_fill",
    "q14_promo_revenue",
    "q17_small_quantity",
    "q18_big_orders",
    "q19_disjunctive",
    "q21_window_running",
    "q22_lag_lead",
    "q23_rank_family",
    "q24_first_last",
    "q25_percentiles",
    "q33_explode_positions",
    "q41_except_union",
    "q42_union_by_name",
    "q43_array_manipulation",
    "q52_sort_limit",
    "q55_null_functions",
    "q57_self_join",
    "q61_json_props",
    "q63_asof_join",
    # --- 2. r10-era: events / streaming-adjacent ---
    "q62_sessionize",
    "q64_tumbling_window",
    "q65_event_pivot",
    "q67_props_as_map",
    # --- 2. r10-era: pipeline / curation / training-data ---
    "q100_hypertable_rollup",
    "q101_vocab_bigrams",
    "q102_salted_join_agg",
    "q104_decontamination",
    "q105_repetition_filter",
    "q106_tfidf_terms",
    "q107_regression_aggs",
    "q108_sequence_packing",
    "q109_cooccurrence",
    "q110_context_chunks",
    "q114_textrank_keywords",
    "q115_fuzzy_vocab",
    "q120_incremental_dedup",
    "q122_lm_score",
    "q123_pii_scrub",
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
