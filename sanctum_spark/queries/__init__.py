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
# Round 8 selection (last-driver-round census over CORRECTNESS_r01–r07:
# r03×12, r05×48, r06×49, r07×50):
#   1. the 12 queries whose last driver row is r03 — now the oldest
#      external anchors (q44/q45 joins, q93/q95/q111–q113/q116–q118/
#      q124/q125 pipeline family);
#   2. 38 of the 48 r05-era queries, prioritizing families whose shared
#      code moved in r6/r7: the shingle/CSE-campaign consumers q142/q143/
#      q144 and the minhash scan-filter change q74 (r7 commits fe982b4,
#      cb95381), the near-dup/ANN family q75/q78/q79/q94/q119/q121/q146
#      (similarity guards r6, prefix-plan adjacency r7), text/multimodal
#      q77/q90 (unicode fixes r6), then the profiling/pipeline/streaming
#      backfill q126–q148/q152/q159–q161 and scalar/array q96–q98/q103.
#   Deferred to r9 (10 r05-era relational/scalar rows, untouched since
#   r5 with r6/r7-green same-family siblings): q29/q35–q39 (TPC-H-ish
#   aggregates ~ q01–q16 r6-green), q66/q69 (scalar fns ~ q50–q55
#   r6/r7-green), q87/q88 (aggregate fns ~ q107 r7-green).
# The FULL registry is still verified every round locally via
# ``tools/verify_local.py`` (driver-strength string compare since r6),
# so rotation never substitutes for whole-surface checking.
VERIFY_FIRST: list[str] = [
    # --- 1. last driver row r03 (stalest external evidence) ---
    "q44_full_outer",
    "q45_right_join",
    "q93_stratified_sample",
    "q95_funnel",
    "q111_cdc_upsert",
    "q112_cohort_retention",
    "q113_lateral_topk",
    "q116_winsorize",
    "q117_group_sample",
    "q118_histogram",
    "q124_train_shards",
    "q125_quality_classifier",
    # --- 2. r05-era: shingle/CSE-campaign consumers (r7 commits) ---
    "q74_minhash_lsh_pairs",
    "q142_cross_source_overlap",
    "q143_compression_ratio",
    "q144_segment_dedup",
    # --- 2. r05-era: near-dup / ANN family (guards r6, prefix r7) ---
    "q75_simhash_pairs",
    "q78_ann_lsh_topk",
    "q79_embedding_neardup",
    "q94_ann_ivf",
    "q119_pq_ann",
    "q121_cross_corpus_neardup",
    "q146_embedding_clusters",
    # --- 2. r05-era: text/multimodal (unicode fixes r6) ---
    "q77_text_profile",
    "q90_multimodal_features",
    # --- 2. r05-era: training-pipeline backfill ---
    "q126_weighted_sample",
    "q127_domain_mix",
    "q128_zorder_key",
    "q129_bpe_vocab",
    "q130_binned_range_join",
    "q140_session_sequences",
    "q159_leakage_free_split",
    "q160_corpus_datasheet",
    "q161_entity_resolution",
    # --- 2. r05-era: validation/profiling backfill ---
    "q132_column_stats",
    "q134_key_skew",
    "q135_ewma",
    "q136_referential_integrity",
    "q137_time_gaps",
    "q138_wow_growth",
    "q139_active_users",
    "q145_mad_outliers",
    "q147_heavy_hitters",
    "q148_trailing_range_frame",
    # --- 2. r05-era: streaming / scalar-array / misc backfill ---
    "q152_cep_pattern",
    "q97_map_functions",
    "q98_hll_mergeable",
    "q133_lateral_udtf",
    # --- 3. plan changed in r8 AFTER their last driver row (the
    # rotation's tie-break rule): the corpus-grain clustering callers
    # adopted cost-based prefix_filter="auto" (naive at the gate's
    # sf0.01), so their next driver row must cover the new routing.
    # q96/q103 (array/map scalars, r05-era, q97-sibling green) deferred
    # to r9 to make room.
    "q99_dedup_clusters",
    "q158_quality_keeper",
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
