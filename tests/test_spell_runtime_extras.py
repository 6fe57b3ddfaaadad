"""Distributed spell runtime extras: error channel (protected calls),
telemetry accumulators, vectorized path equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from sanctum_spark.io import load_table
from sanctum_spark.spells import Spell, apply_spell
from sanctum_spark.spells.runtime import apply_spell_safely, split_errors
from sanctum_spark.spells.telemetry import instrumented_spell

OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("doubled", T.DoubleType()),
    ]
)


def _make_flaky_cast():
    # returned as a closure: cloudpickle serializes closures by value, so
    # workers don't need this test module importable
    def flaky_cast(event):
        if event["event_id"] % 10 == 0:
            raise ValueError(f"bad event {event['event_id']}")
        return {"event_id": event["event_id"], "doubled": event["value"] * 2}

    return flaky_cast


def test_error_channel_routes_dead_letters(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "value").limit(200)
    out = apply_spell_safely(ev, Spell(name="flaky", cast=_make_flaky_cast()), OUT_SCHEMA)
    good, bad = split_errors(out)
    n = 200
    n_bad = len([i for i in range(n) if i % 10 == 0])
    assert bad.count() == n_bad
    assert good.count() == n - n_bad
    row = bad.orderBy("_error_id").first()
    assert row["_error"].startswith("ValueError: bad event")
    assert row["_error_id"] % 10 == 0
    # good rows carry no error columns
    assert set(good.columns) == {"event_id", "doubled"}


def test_unprotected_spell_fails_the_job(spark, sf_dir):
    import pytest
    from py4j.protocol import Py4JJavaError

    ev = load_table(spark, sf_dir, "events").select("event_id", "value").limit(50)
    out = apply_spell(ev, Spell(name="flaky", cast=_make_flaky_cast()), OUT_SCHEMA)
    with pytest.raises(Exception):
        out.collect()


def test_telemetry_accumulators(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    n_total = ev.count()

    def make_cast():
        def cast(event):
            if event["value"] < 50:
                return None
            return {"event_id": event["event_id"], "doubled": event["value"] * 2}
        return cast
    cast = make_cast()

    wrapped, metrics = instrumented_spell(spark, Spell(name="m", cast=cast))
    out = apply_spell(ev, wrapped, OUT_SCHEMA)
    n_out = out.count()
    rep = metrics.report()
    assert rep["casts"] == n_total
    assert rep["drops"] == n_total - n_out
    assert rep["errors"] == 0
    assert rep["total_sec"] > 0
    assert rep["ns_per_cast"] > 0


def test_emission_channel_distributed(spark, sf_dir):
    """O8 console-sink parity on the distributed path: each event's
    printed lines are captured into _emits, matching the reference's
    golden emission sequences per event."""
    from sanctum_spark.spells.runtime import apply_spell_with_emits

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", (F.get_json_object("props", "$.k").cast("long") % 4 + 1).alias("counter")
    ).limit(50)

    def make_cast():
        def cast(event):
            if event["counter"] <= 1:
                print("The counter has reached 0, stopping.")
                return None
            event = dict(event)
            event["counter"] -= 1
            print(f"The counter is now {event['counter']}.")
            return event
        return cast

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("n_casts", T.LongType()),
        ]
    )
    out = apply_spell_with_emits(
        ev, Spell(name="dec", cast=make_cast()), schema, mode="loop"
    ).collect()
    assert len(out) == 50
    for r in out:
        # k%4+1 ∈ [1,4] → lines: (n-1) decrements + 1 stop line
        assert r["_emits"][-1] == "The counter has reached 0, stopping."
        assert len(r["_emits"]) == max(r["n_casts"] - 1, 0) + 1
