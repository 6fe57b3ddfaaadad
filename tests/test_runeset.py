"""Runeset (YAML config) tests — the reference's declared-but-unbuilt
configuration surface, wired to spell registration + routing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sanctum_spark.io import load_table
from sanctum_spark.runeset import Runeset, build_spells, load_runeset
from sanctum_spark.spells import SpellMissingCastError, apply_spell

RUNESET_YAML = """
session:
  shuffle_partitions: 8
spells:
  - name: boost
    module: examples.boost_spell
    topic: purchase
    config: {factor: 3}
  - name: raw_cast
    module: examples.boost_spell:plain_cast
sinks:
  event_log: /tmp/rs_log
"""


def test_load_and_build(tmp_path):
    rs = load_runeset(RUNESET_YAML)
    assert rs.session["shuffle_partitions"] == 8
    assert rs.sinks["event_log"] == "/tmp/rs_log"
    spells = build_spells(rs)
    assert [s.name for s in spells] == ["boost", "raw_cast"]
    assert spells[0].topic == "purchase"
    assert spells[0].config == {"factor": 3}
    # file-path form
    p = tmp_path / "rs.yaml"
    p.write_text(RUNESET_YAML)
    assert load_runeset(str(p)).spells == rs.spells


def test_build_spells_does_not_mutate_shared_spell():
    """A module-level Spell reused across runeset entries must not pick up
    one entry's topic/config overrides (build_spells builds fresh copies)."""
    from sanctum_spark.spells.registry import Spell

    shared = Spell(name="shared", cast=lambda ev: None, topic="orig",
                   config={"a": 1})
    rs = Runeset(spells=[
        {"name": "first", "spell": shared, "topic": "t1", "config": {"b": 2}},
        {"name": "second", "spell": shared},
    ])
    built = build_spells(rs)
    assert shared.topic == "orig" and shared.config == {"a": 1}
    assert built[0].topic == "t1" and built[0].config == {"a": 1, "b": 2}
    assert built[1].topic == "orig" and built[1].config == {"a": 1}


def test_invalid_spell_entry_raises_registration_error():
    rs = Runeset(spells=[{"name": "broken", "spell": {}}])
    with pytest.raises(SpellMissingCastError):
        build_spells(rs)


def test_runeset_spell_runs_distributed(spark, sf_dir):
    spells = build_spells(load_runeset(RUNESET_YAML))
    boost = spells[0]
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = apply_spell(
        ev,
        boost,
        T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("boosted", T.DoubleType()),
            ]
        ),
        topic_col="event_type",
    )
    want = ev.filter("event_type = 'purchase'").count()
    rows = out.collect()
    assert len(rows) == want
    sample = ev.filter("event_type = 'purchase'").orderBy("event_id").first()
    got = {r["event_id"]: r["boosted"] for r in rows}
    assert got[sample["event_id"]] == sample["value"] * 3
