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
# Round 11 selection (last-driver-round census over CORRECTNESS_r01-r10:
# r07x9, r08x50, r09x50, r10x50 - verified at round start; r10 verdict
# task #1 orders this rotation explicitly):
#   1. the 9 r7-era rows deferred by the r10 rotation (named in the r10
#      verdict): q53 (string fns), q58 (sort-merge hint), q60 (topic
#      routing), q80-q85 (spell/UDF execution-tier family) - four rounds
#      since their last external check, now the staleness floor;
#   2. 41 of the 50 r08-era queries.  All 50 tie on staleness, so the
#      standing tie-break applies: defer the 9 with the strongest
#      independent in-suite evidence, which here are the rows-only
#      approximate families whose driver check is weakest anyway (the
#      driver can only count rows for them) and which each carry
#      independent model/accuracy/determinism pins plus a dedicated fuzz
#      family: q74 (MinHash-LSH, family B + six-octave slope series),
#      q75 (SimHash, family C + pigeonhole pins), q78/q94/q119
#      (SRP-LSH / IVF / PQ ANN, numpy fuzz family D), q121 (cross-corpus
#      near-dup, family G), q129 (BPE vocab, family L), q143 (zlib
#      compression ratio, direct-zlib pins), plus q99_dedup_clusters,
#      whose production MinHash-edge composition got a fresh suite-level
#      output pin in r10 (tests/test_operators.py:1844) and family-N
#      coverage.  Rotating oracle-paired rows in ahead of rows-only rows
#      maximizes the external evidence the 50 driver slots buy.
# After this round the staleness floor is r8 with only those 9 rows on
# it; they are the r12 front-50 seed.
# The FULL registry is still verified every round locally via
# ``tools/verify_local.py`` (driver-strength string compare since r6),
# so rotation never substitutes for whole-surface checking.
VERIFY_FIRST: list[str] = [
    # --- 1. last driver row r07 (stalest external evidence) ---
    "q53_string_functions",
    "q58_sort_merge_hint",
    "q60_topic_routing",
    "q80_spell_cast",
    "q81_spell_loop",
    "q82_spell_cast_vectorized",
    "q83_grouped_agg_udf",
    "q84_spell_fanout_udtf",
    "q85_grouped_map_normalize",
    # --- 2. r08-era: joins / relational ---
    "q44_full_outer",
    "q45_right_join",
    "q97_map_functions",
    "q98_hll_mergeable",
    "q111_cdc_upsert",
    "q112_cohort_retention",
    "q113_lateral_topk",
    "q130_binned_range_join",
    "q133_lateral_udtf",
    "q138_wow_growth",
    "q139_active_users",
    "q148_trailing_range_frame",
    # --- 2. r08-era: text / dedup / multimodal / similarity ---
    "q77_text_profile",
    "q79_embedding_neardup",
    "q90_multimodal_features",
    "q142_cross_source_overlap",
    "q144_segment_dedup",
    "q146_embedding_clusters",
    "q159_leakage_free_split",
    "q161_entity_resolution",
    # --- 2. r08-era: sampling / mixing / shards ---
    "q93_stratified_sample",
    "q117_group_sample",
    "q124_train_shards",
    "q125_quality_classifier",
    "q126_weighted_sample",
    "q127_domain_mix",
    "q158_quality_keeper",
    # --- 2. r08-era: profiling / validation / layout ---
    "q95_funnel",
    "q116_winsorize",
    "q118_histogram",
    "q128_zorder_key",
    "q132_column_stats",
    "q134_key_skew",
    "q135_ewma",
    "q136_referential_integrity",
    "q137_time_gaps",
    "q140_session_sequences",
    "q145_mad_outliers",
    "q147_heavy_hitters",
    "q152_cep_pattern",
    "q160_corpus_datasheet",
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
