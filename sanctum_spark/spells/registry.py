"""Spell registration and routing.

A spell is either a bare callable (becomes ``cast``) or a mapping with:
- ``cast``       required per-event function: ``cast(event) -> event | None``
- ``topic``      optional string; routes which events reach the spell
- ``prepare``    optional lifecycle hook (runs once per partition task
                 before the first event — reference roadmap
                 docunomicon/README.md:30-48)
- ``unprepare``  optional teardown hook (after the last event)

Validation reproduces the reference's three registration error classes
exactly (reference: src/main.zig:238-264); topic matching reproduces the
null semantics the reference *implements* (code wins over its docs):
a spell with no topic matches every event AND an event with no topic
matches every spell (src/main.zig:169-210).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from sanctum_spark.spells.errors import (
    SpellCastNotCallableError,
    SpellMissingCastError,
    SpellNotATableError,
    SpellTopicTypeError,
)


@dataclass
class Spell:
    name: str
    cast: Callable
    topic: str | None = None
    prepare: Callable | None = None
    unprepare: Callable | None = None
    source: str | None = None
    config: dict = field(default_factory=dict)
    # vectorized=True: ``cast`` receives/returns whole pandas DataFrames
    # (Arrow batch at a time) instead of one event dict — the fast path
    # when the spell body is expressible as columnar operations.
    vectorized: bool = False


@dataclass
class ExpressionSpell:
    """A spell whose cast compiles to Catalyst expressions — the
    zero-Python production tier.

    ``project`` maps output column name -> SQL expression string (or
    Column); ``where`` is an optional SQL predicate applied after topic
    routing (a row failing it is dropped, the expression analog of a
    ``cast`` returning None).  Execution is a plain filter+select, so the
    whole cast runs inside WholeStageCodegen at JVM scan speed: no Arrow
    boundary, no Python workers — measured ~20x the sustained
    Arrow-vectorized tier on the boost pipeline (bench.py).  Spells whose
    logic needs arbitrary Python (stateful recurrences, external libs)
    stay on the vectorized/row tiers; everything expressible belongs
    here at 100 TB.
    """

    name: str
    project: Mapping[str, object]  # name -> SQL string | Column
    where: object | None = None  # SQL string | Column
    topic: str | None = None


def validate_spell(obj: object, name: str = "spell", source: str | None = None) -> Spell:
    """Registration-time validation, error classes per the reference.

    Order matters: not-a-table wins, then missing-cast, then
    cast-not-callable (reference: src/main.zig:238-264).
    """
    if isinstance(obj, Spell):
        return obj
    if callable(obj) and not isinstance(obj, Mapping):
        return Spell(name=name, cast=obj, source=source)
    if not isinstance(obj, Mapping):
        raise SpellNotATableError(obj, source)
    if "cast" not in obj:
        raise SpellMissingCastError(source)
    cast = obj["cast"]
    if not callable(cast):
        raise SpellCastNotCallableError(cast, source)
    topic = obj.get("topic")
    if topic is not None and not isinstance(topic, str):
        raise SpellTopicTypeError("spell", topic, source)
    prepare = obj.get("prepare")
    unprepare = obj.get("unprepare")
    return Spell(
        name=name,
        cast=cast,
        topic=topic,
        prepare=prepare if callable(prepare) else None,
        unprepare=unprepare if callable(unprepare) else None,
        source=source,
    )


def compose_spells(spells: list[Spell], name: str = "composed") -> Spell:
    """Chain spells into one: each event flows through every cast in
    order, with the data-only boundary enforced between stages (the
    multi-spell topology of the reference's roadmap, README.md:92-93,
    collapsed into a single pass).

    A ``None`` from any stage drops the event (the chain short-circuits).
    Per-spell topics still apply: a stage is skipped — not a drop — when
    the event's ``$topic`` doesn't match it (O4 semantics).
    """
    from sanctum_spark.codec import roundtrip

    validated = [s if isinstance(s, Spell) else validate_spell(s) for s in spells]

    def chained(event):
        for s in validated:
            if not matches_topic(s.topic, event.get("$topic") if isinstance(event, dict) else None):
                continue
            out = s.cast(event)
            if out is None:
                return None
            event = roundtrip(out) if isinstance(out, dict) else out
        return event

    return Spell(name=name, cast=chained)


def matches_topic(spell_topic: str | None, event_topic: object) -> bool:
    """Null-tolerant equality (reference: src/main.zig:169-210).

    - spell has no topic  → matches every event (src/main.zig:173-177)
    - event has no topic  → matches every spell (src/main.zig:192-196)
    - non-string topic on either side → fatal (src/main.zig:179-183, 198-202)
    """
    if spell_topic is None:
        return True
    if not isinstance(spell_topic, str):
        raise SpellTopicTypeError("spell", spell_topic)
    if event_topic is None:
        return True
    if not isinstance(event_topic, str):
        raise SpellTopicTypeError("event", event_topic)
    return spell_topic == event_topic


def topic_filter(spell: Spell, topic_col: str | Column = "topic") -> Column:
    """The same routing predicate as a Catalyst expression (pushed down to
    the scan when applied before the cast)."""
    col = F.col(topic_col) if isinstance(topic_col, str) else topic_col
    if spell.topic is None:
        return F.lit(True)
    return col.isNull() | (col == F.lit(spell.topic))
