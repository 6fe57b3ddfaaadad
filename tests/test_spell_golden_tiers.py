"""Reference golden suites on the zero-Python expression tier
(r6 verdict task #4): the decrement-counter family's casts are pure
arithmetic, so they compile to the Catalyst loop
(``loop_expression_spell`` — one aggregate/sequence fold per row, no
Python workers), and the emission sequences must be byte-identical to
the reference's golden files AND to the row-Python tier.

Suite disposition (/root/reference/src/tests/test-suite/*):

- decrement-counter, decrement-counter-float,
  decrement-counter-implicit-return: EXPRESSIBLE — ported below; the
  emitted state sequence is pinned across tiers and rendered to the
  exact stdout.assert bytes.
- topic-singular-filtering: EXPRESSIBLE — topic routing is shared
  (topic_filter); pinned below on both expression paths.
- error-missing-cast-function, error-spell-does-not-return-table,
  error-spell-has-non-function-cast-member: NOT TIER-APPLICABLE — the
  three registration error classes fire in validate_spell BEFORE any
  tier is chosen (a Lua-table-shaped spell object is what's being
  validated; an ExpressionSpell is constructed, not validated from a
  table).  Their byte-parity pins live in tests/test_spells.py /
  test_cli.py and apply to every tier equally.

The print() lines in the reference suites are cast-body side effects
(console sink, O8), not engine output: the engine-level emission
sequence is the event states, so the tier pin compares states and the
golden pin renders them through the suite's own format strings.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from sanctum_spark.spells import (
    ExpressionSpell,
    RUNAWAY_LOOP_BOUND,
    apply_expression_spell,
    loop_expression_spell,
    simulate,
)

SUITES = "/root/reference/src/tests/test-suite"

# The three decrement suites as ExpressionSpells.  Cast semantics
# (spell.lua of each suite): return nil unless counter > 1, else
# counter -= 1 and emit.
DECR = ExpressionSpell(
    name="decrement-counter",
    project={"counter": "counter - 1"},
    where="counter > 1",
)


def _golden(name: str) -> list[str] | None:
    path = os.path.join(SUITES, name, "stdout.assert")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return f.read().decode().split("\n")[:-1]


def _row_tier_states(seed_counter):
    """Emitted counter states through the reference-shaped row-Python
    cast (same body as tests/test_spells.py decrement_counter_spell)."""

    def cast(event):
        if event["counter"] <= 1:
            return None
        # new dict, not in-place: simulate keeps a reference to the
        # incoming event in result.events, and the reference's msgpack
        # round trip means the Lua table mutation never aliases history
        return {**event, "counter": event["counter"] - 1}

    r = simulate({"cast": cast}, {"counter": seed_counter})
    return [e["counter"] for e in r.events[1:]], r.casts


@pytest.mark.parametrize(
    "suite, seed, fmt, stop",
    [
        (
            "decrement-counter",
            10,
            "The counter is now {v:d}.",
            "The counter has reached 0, stopping.",
        ),
        (
            "decrement-counter-float",
            10.5,
            "The counter is now {v:.1f}.",
            "The counter is too small now, stopping.",
        ),
        (
            "decrement-counter-implicit-return",
            2,
            "The counter is now {v:d}.",
            "The counter has reached 0, stopping.",
        ),
    ],
)
def test_decrement_golden_expression_tier(spark, suite, seed, fmt, stop):
    """Expression-tier loop == row-tier loop == golden stdout bytes."""
    df = spark.createDataFrame(
        [(1, float(seed) if isinstance(seed, float) else seed)],
        ["event_id", "counter"],
    )
    got = (
        loop_expression_spell(df, DECR, emit="all")
        .orderBy("cast_idx")
        .collect()
    )
    states = [r["counter"] for r in got]
    assert [r["cast_idx"] for r in got] == list(range(1, len(states) + 1))

    # tier parity: identical emitted state sequence and cast count
    row_states, row_casts = _row_tier_states(seed)
    assert states == row_states
    fin = loop_expression_spell(df, DECR, emit="final").collect()[0]
    assert fin["n_casts"] == row_casts
    assert fin["counter"] == (row_states[-1] if row_states else seed)

    # golden byte parity: the suite's own format over the emitted states
    lines = [fmt.format(v=v) for v in states] + [stop]
    golden = _golden(suite)
    if golden is None:
        pytest.skip("reference golden files not present")
    assert lines == golden


def test_topic_singular_filtering_expression_tier(spark):
    """Golden suite topic-singular-filtering on the expression tier: a
    topic mismatch is a silent no-op on both the single-cast path and
    the loop path (reference: src/main.zig:147-150)."""
    spell = ExpressionSpell(
        name="topic-counter",
        project={"counter": "counter - 1"},
        where="counter > 1",
        topic="counter",
    )
    df = spark.createDataFrame(
        [(10, "not-a-counting-spell")], ["counter", "$topic"]
    )
    assert apply_expression_spell(df, spell, topic_col="$topic").count() == 0
    assert loop_expression_spell(df, spell, topic_col="$topic").count() == 0
    assert (
        loop_expression_spell(df, spell, topic_col="$topic", emit="all").count()
        == 0
    )
    # and the code-wins null semantics: no $topic on the event -> matches
    df2 = spark.createDataFrame([(3, None)], "counter long, `$topic` string")
    assert loop_expression_spell(df2, spell, topic_col="$topic").count() == 1


def test_runaway_bound_expression_tier(spark):
    """The 1000-cast runaway bound (reference O7) on the expression
    loop: a counter that cannot reach the floor within the bound stops
    at exactly RUNAWAY_LOOP_BOUND casts, state sequence identical to
    the row tier's."""
    seed = RUNAWAY_LOOP_BOUND + 200
    df = spark.createDataFrame([(seed,)], ["counter"])
    fin = loop_expression_spell(df, DECR, emit="final").collect()[0]
    row_states, row_casts = _row_tier_states(seed)
    assert fin["n_casts"] == row_casts == RUNAWAY_LOOP_BOUND
    assert fin["counter"] == row_states[-1] == seed - RUNAWAY_LOOP_BOUND
    n_all = loop_expression_spell(df, DECR, emit="all").count()
    assert n_all == len(row_states) == RUNAWAY_LOOP_BOUND


def test_loop_expression_plan_is_zero_python(spark):
    """The expression loop must stay pure Catalyst: no Python eval
    operator in the physical plan for either emit mode."""
    df = spark.range(100).selectExpr("id AS event_id", "id % 13 AS counter")
    for emit in ("final", "all"):
        plan = (
            loop_expression_spell(df, DECR, emit=emit)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for node in (
            "ArrowEvalPython",
            "BatchEvalPython",
            "MapInPandas",
            "PythonMapInArrow",
            "FlatMapGroupsInPandas",
        ):
            assert node not in plan, f"{emit}: {node} in plan"


def test_loop_expression_batch_matches_row_tier(spark):
    """Beyond the single-seed golden shape: a whole column of seeds
    (incl. 0, 1, negatives — where fails on the FIRST cast) loops to
    the same (final state, n_casts) as the row tier, in one pass."""
    seeds = [-3, 0, 1, 2, 3, 7, 10, 999]
    df = spark.createDataFrame([(s,) for s in seeds], ["counter"])
    got = {
        r["counter"]: r["n_casts"]
        for r in loop_expression_spell(df, DECR, emit="final").collect()
    }
    want = {}
    for s in seeds:
        states, casts = _row_tier_states(s)
        want[states[-1] if states else s] = casts
    assert got == want


def test_loop_expression_rejects_column_exprs(spark):
    """Column-valued project/where can't be rewritten against the loop
    state — must fail loudly at call time."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(5,)], ["counter"])
    bad = ExpressionSpell(
        name="bad", project={"counter": F.col("counter") - 1}, where="counter > 1"
    )
    with pytest.raises(TypeError, match="SQL strings in loop mode"):
        loop_expression_spell(df, bad)
    with pytest.raises(ValueError, match="seed columns missing"):
        loop_expression_spell(
            spark.createDataFrame([(1,)], ["x"]), DECR
        )


def test_q81_loop_expression_tier_matches_registered_query(spark, sf_dir):
    """The registered q81 feedback loop (mapInPandas row tier over the
    REAL events table) equals the zero-Python expression loop.

    Semantics note: q81's row tier sees a missing/malformed $.k as NaN
    (pandas NULL), and NaN <= 1 is False, so the spell can never
    terminate and runs to the 1000-cast runaway bound; the expression
    analog is `counter IS NULL OR counter > 1` (NULL - 1 stays NULL, so
    the state is a fixed point and the bound fires)."""
    import sanctum_spark.queries as qreg
    from pyspark.sql import functions as F

    from sanctum_spark.io import load_table

    qreg.load_all_modules()
    row_tier = {
        r["event_id"]: r["n_casts"]
        for r in qreg.REGISTRY["q81_spell_loop"].fn(spark, sf_dir).collect()
    }

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("long").alias("counter"),
    )
    spell = ExpressionSpell(
        name="decrement-q81",
        project={"counter": "counter - 1"},
        where="counter IS NULL OR counter > 1",
    )
    expr_tier = {
        r["event_id"]: r["n_casts"]
        for r in loop_expression_spell(ev, spell, emit="final").collect()
    }
    assert expr_tier == row_tier and len(expr_tier) > 0
