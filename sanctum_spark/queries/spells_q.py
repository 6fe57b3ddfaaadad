"""Spell-runtime queries: the reference's event semantics run distributed
(mapInPandas) and checked against a SQL oracle.

q80 proves the O5 per-event transform (1 → 0..1 rows, topic-routed with
null semantics); q81 proves the O7 feedback loop (loop-until-nil, bound
1000) as a single-pass per-event iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sanctum_spark.io import load_table, parquet_split_count, spread_scan
from sanctum_spark.queries import register
from sanctum_spark.queries.util import sql_json_int
from sanctum_spark.spells import ExpressionSpell, Spell, apply_spell, loop_spell

# The boost cast on the zero-Python expression tier: identical semantics
# to _boost_cast/_boost_cast_vectorized below, compiled to Catalyst
# (WholeStageCodegen, no Arrow boundary).  bench.py measures this tier's
# sustained throughput alongside the Arrow-vectorized one; equivalence of
# all three tiers — INCLUDING NaN and rounding half-boundaries — is
# pinned in tests/test_spell_runtime_extras.py.  Two corner-case notes
# (found by adversarial review, r6):
# - the drop predicate is the reference's `value < 50 -> nil` NEGATED,
#   not `value >= 50`: NaN < 50 is false in Lua/Python/pandas/Spark/
#   DuckDB alike, so a NaN event is KEPT by every tier, while
#   `value >= 50` would also keep it in Spark (NaN sorts above all)
#   but drop it in pandas — `NOT (value < 50)` agrees everywhere; and
#   a NULL value must be kept EXPLICITLY (`value IS NULL OR ...`): the
#   Arrow boundary renders SQL NULL as pandas NaN, so the Python tiers
#   cannot distinguish them and keep both — a bare NOT(value<50) in
#   Catalyst/SQL is three-valued and would silently drop the NULL rows
#   the Python tiers emit (found by the r6 degenerate-row sweep);
# - bround (HALF_EVEN), not round (HALF_UP), to match Python round()
#   and pandas .round() on exact half-boundaries like 100.125;
# - nanvl(..., NULL): the Python tiers' Arrow boundary normalizes float
#   NaN to null (pandas uses NaN as its null sentinel, and
#   pa.Array.from_pandas maps it to null) — that IS the engine's event-
#   boundary rule, so the expression tier normalizes the same way
#   instead of leaking a genuine NaN the other tiers cannot produce.
BOOST_EXPR_SPELL = ExpressionSpell(
    name="boost_expr",
    where="(value IS NULL) OR NOT (value < 50)",
    project={
        "event_id": "event_id",
        "user_id": "user_id",
        "boosted_value": "nanvl(bround(value * 2, 2), CAST(NULL AS DOUBLE))",
    },
    topic="purchase",
)


def _boost_cast(event: dict) -> dict | None:
    # per-event transform: drop low-value events (None == "return nil"),
    # emit a new event shape otherwise (reference O5: src/main.zig:272-306).
    if event["value"] < 50:
        return None
    return {
        "event_id": event["event_id"],
        "user_id": event["user_id"],
        "boosted_value": round(event["value"] * 2, 2),
    }


@register(
    "q80_spell_cast",
    """
    SELECT event_id, user_id, ROUND(value * 2, 2) AS boosted_value
    FROM events
    WHERE (event_type IS NULL OR event_type = 'purchase')
      AND (value IS NULL OR NOT (value < 50))
    """,
    doc="distributed spell cast: topic-routed, 0..1 rows per event.",
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    spell = Spell(name="boost", cast=_boost_cast, topic="purchase")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("boosted_value", T.DoubleType()),
        ]
    )
    return apply_spell(ev, spell, schema, topic_col="event_type")


def _boost_cast_vectorized(pdf):
    # same semantics as _boost_cast, columnar: one pandas expression per
    # Arrow batch instead of a Python loop per event (~10-100x on wide
    # batches; this is the production form of a hot spell).  The filter
    # is the row tier's `value < 50 -> drop` NEGATED: `pdf.value >= 50`
    # would silently DROP NaN rows the per-row tier keeps (NaN < 50 is
    # false, so the row cast proceeds and emits), diverging the tiers.
    kept = pdf[~(pdf["value"] < 50)]
    out = kept[["event_id", "user_id"]].copy()
    out["boosted_value"] = (kept["value"] * 2).round(2)
    return out


@register(
    "q82_spell_cast_vectorized",
    """
    SELECT event_id, user_id, ROUND(value * 2, 2) AS boosted_value
    FROM events
    WHERE (event_type IS NULL OR event_type = 'purchase')
      AND (value IS NULL OR NOT (value < 50))
    """,
    doc="vectorized spell cast: same semantics as q80 on the columnar path.",
)
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    spell = Spell(
        name="boost_vec", cast=_boost_cast_vectorized, topic="purchase", vectorized=True
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("boosted_value", T.DoubleType()),
        ]
    )
    return apply_spell(ev, spell, schema, topic_col="event_type")


def _decrement_cast(event: dict) -> dict | None:
    # the decrement-counter spell of the reference test suite
    # (src/tests/test-suite/decrement-counter/spell.lua), payload-only.
    if event["counter"] <= 1:
        return None
    out = dict(event)
    out["counter"] = out["counter"] - 1
    return out


@register(
    "q81_spell_loop",
    f"""
    SELECT event_id,
           -- missing/malformed/non-integer $.k: the counter spell cannot
           -- terminate, so the loop runs to the reference's runaway bound
           -- (O7, 1000) — NOT the GREATEST(NULL,1)=1 DuckDB would give
           CASE WHEN {sql_json_int("props", "'$.k'")} IS NULL
                THEN 1000
                ELSE CAST(LEAST(GREATEST({sql_json_int("props", "'$.k'")}, 1),
                      1000) AS BIGINT) END AS n_casts
    FROM events
    """,
    doc=(
        "feedback loop (reference O7, bound 1000) run per-event inside one "
        "mapInPandas pass; n_casts == closed form LEAST(GREATEST(k,1),1000)."
    ),
)
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread_scan (r13, guide §2.5/§4): the events scan is single-row-group
    # (one task), so the per-event Python while-loop — the most expensive
    # per-row work in any registered query — ran serially on one core.
    # Fanning out is per-row deterministic (n_casts depends only on the
    # row), diff 0/0; paired A/B median ratio 0.44 (1.81 s -> 0.79 s).
    # q80/q82/q84 measured as LOSERS (1.5x/2.1x/1.2x — their Python is
    # batch-cheap and the added exchange dominates); only the loop tier
    # carries enough per-row work to win.
    ev = spread_scan(
        load_table(spark, sf_dir, "events"),
        parquet_split_count(sf_dir, "events"),
    ).select(
        "event_id", F.get_json_object("props", "$.k").try_cast("long").alias("counter")
    )
    spell = Spell(name="decrement", cast=_decrement_cast)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("n_casts", T.LongType()),
        ]
    )
    return loop_spell(ev, spell, schema)
