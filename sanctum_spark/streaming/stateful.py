"""Stateful spells: the reference's durable-state roadmap
(README.md:106-110 — "durable spell state", KV store with range queries)
as per-key state over ``applyInPandasWithState``.

A stateful spell is three callables over a per-key KV dict:
- ``init() -> dict``                                  initial state
- ``update(state: dict, batch: pd.DataFrame) -> dict`` fold one event batch
- ``emit(key, state) -> dict | None``                 output row per batch

State survives across micro-batches via the Spark state store (RocksDB /
HDFS-backed provider on a cluster), which is the durable-KV semantics the
reference declares but never built.  Range queries over the state
(README.md:110) are served by emitting state snapshots and filtering —
see ``range_query_state`` in tests.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


@dataclass
class StatefulSpell:
    name: str
    init: Callable[[], dict]
    update: Callable[[dict, pd.DataFrame], dict]
    emit: Callable[[tuple, dict], dict | None]
    state_schema: T.StructType = field(default_factory=lambda: T.StructType())
    output_schema: T.StructType = field(default_factory=lambda: T.StructType())


def apply_stateful_spell(
    events: DataFrame,
    spell: StatefulSpell,
    key_cols: list[str],
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Run a stateful spell per key over a (streaming) DataFrame.

    The state dict is persisted as a tuple matching ``state_schema`` field
    order; emitted rows follow ``output_schema``.
    """
    state_fields = [f.name for f in spell.state_schema.fields]
    out_fields = [f.name for f in spell.output_schema.fields]
    init, update, emit = spell.init, spell.update, spell.emit

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            st = dict(zip(state_fields, state.get))
        else:
            st = init()
        for pdf in pdf_iter:
            st = update(st, pdf)
        state.update(tuple(st[f] for f in state_fields))
        row = emit(key, st)
        if row is not None:
            yield pd.DataFrame({f: [row.get(f)] for f in out_fields})

    return events.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=spell.output_schema,
        stateStructType=spell.state_schema,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def counter_spell() -> StatefulSpell:
    """The decrement/counter family as durable per-key state: running event
    count + value sum per key (reference's per-spell counter state)."""
    return StatefulSpell(
        name="counter",
        init=lambda: {"n": 0, "total": 0.0},
        update=lambda st, pdf: {
            "n": st["n"] + len(pdf),
            "total": st["total"] + float(pdf["value"].sum()),
        },
        emit=lambda key, st: {
            "user_id": key[0],
            "event_type": key[1],
            "n": st["n"],
            "total": round(st["total"], 2),
        },
        state_schema=T.StructType(
            [
                T.StructField("n", T.LongType()),
                T.StructField("total", T.DoubleType()),
            ]
        ),
        output_schema=T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("n", T.LongType()),
                T.StructField("total", T.DoubleType()),
            ]
        ),
    )
