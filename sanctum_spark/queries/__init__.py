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
# Round 7 selection (last-driver-round census over CORRECTNESS_r01–r06):
#   1. the 12 queries whose last driver row is r02 — four rounds stale
#      (q17–q19, q21, q22, q24, q41, q42, q53, q55, q57, q58);
#   2. 37 of the 49 r03-era queries, prioritizing families whose shared
#      code moved in r5/r6: the spell surface q80–q85 (expression tier,
#      runtime refactors), text/JSON-touched q61/q71/q72/q76/q105/q122/
#      q123 (try_cast hardening, unicode sweep fixes), dedup/similarity
#      q70/q73/q91/q92/q99/q120 (zero-norm + NULL-vector guards), and the
#      streaming/event families q60/q62–q65/q86/q89;
#   3. q67_props_as_map (last row r06, but its oracle helper
#      ``util.sql_json_int`` changes this round per ADVICE item 2 —
#      re-verify the new oracle externally).
#   Deferred to r8 (12 r03-era rows, each with an r5/r6-verified
#   same-family sibling): q44/q45 (joins ~ q03–q13 r6), q93/q95/q111–q113/
#   q116–q118/q124/q125 (pipeline family siblings q149–q158 r6-green).
# The FULL registry is still verified every round locally via
# ``tools/verify_local.py`` (driver-strength string compare since r6),
# so rotation never substitutes for whole-surface checking.
VERIFY_FIRST: list[str] = [
    # --- 1. last driver row r02 (stalest external evidence) ---
    "q17_small_quantity",
    "q18_big_orders",
    "q19_disjunctive",
    "q21_window_running",
    "q22_lag_lead",
    "q24_first_last",
    "q41_except_union",
    "q42_union_by_name",
    "q53_string_functions",
    "q55_null_functions",
    "q57_self_join",
    "q58_sort_merge_hint",
    # --- 2. r03-era: spell surface (expression tier landed r6) ---
    "q80_spell_cast",
    "q81_spell_loop",
    "q82_spell_cast_vectorized",
    "q83_grouped_agg_udf",
    "q84_spell_fanout_udtf",
    "q85_grouped_map_normalize",
    # --- 2. r03-era: text/JSON paths hardened in r6 ---
    "q61_json_props",
    "q71_text_stats",
    "q72_lang_quality",
    "q76_quality_profile",
    "q105_repetition_filter",
    "q122_lm_score",
    "q123_pii_scrub",
    # --- 2. r03-era: dedup/similarity (NULL/zero-norm guards r6) ---
    "q70_exact_dedup",
    "q73_cosine_topk",
    "q91_ngram_jaccard",
    "q92_corpus_clean",
    "q99_dedup_clusters",
    "q120_incremental_dedup",
    # --- 2. r03-era: events/streaming/windows ---
    "q60_topic_routing",
    "q62_sessionize",
    "q63_asof_join",
    "q64_tumbling_window",
    "q65_event_pivot",
    "q86_event_sequence",
    "q89_dispersion",
    # --- 2. r03-era: pipeline/profiling backfill ---
    "q100_hypertable_rollup",
    "q101_vocab_bigrams",
    "q102_salted_join_agg",
    "q104_decontamination",
    "q106_tfidf_terms",
    "q107_regression_aggs",
    "q108_sequence_packing",
    "q109_cooccurrence",
    "q110_context_chunks",
    "q114_textrank_keywords",
    "q115_fuzzy_vocab",
    # --- 3. oracle-helper change this round (ADVICE item 2) ---
    "q67_props_as_map",
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
