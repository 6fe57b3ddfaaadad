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

Backend note: Spark 4's newer ``transformWithStateInPandas`` (typed
ValueState/MapState/timers over RocksDB) is the natural successor API.
Its Python runner needs ``google.protobuf``, broken in this container
(no network to fix), so ``typed_state_backend_available()`` probes at
RUNTIME each round and ``apply_stateful_spell(backend="auto")`` upgrades
automatically the moment the environment heals; until then the stable
``applyInPandasWithState`` backend carries the same StatefulSpell surface
— callers never see the swap.
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
    """Per-key stateful fold.

    ``update`` is called once per pandas CHUNK by default — Spark splits a
    key's micro-batch into multiple arbitrary-order chunks when it exceeds
    the Arrow batch size, so commutative/associative folds (sums, counts)
    are safe but order-sensitive recurrences are NOT.  An order-sensitive
    spell must set ``order_by``: the runner then concatenates the whole
    per-key batch, sorts it once on those columns, and calls ``update``
    exactly once per micro-batch.
    """

    name: str
    init: Callable[[], dict]
    update: Callable[[dict, pd.DataFrame], dict]
    emit: Callable[[tuple, dict], dict | None]
    state_schema: T.StructType = field(default_factory=lambda: T.StructType())
    output_schema: T.StructType = field(default_factory=lambda: T.StructType())
    order_by: list[str] | None = None


def typed_state_backend_available() -> tuple[bool, str]:
    """Runtime probe for the ``transformWithStateInPandas`` typed-state
    backend.  The Python runner imports ``google.protobuf`` at worker
    init; this container ships Spark 4 with the API present but protobuf
    missing, so the probe re-checks every session and the engine
    auto-upgrades when the environment heals."""
    try:
        import google.protobuf  # noqa: F401  (what the tWS runner needs)
    except ImportError as e:
        return False, f"google.protobuf unavailable: {e}"
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
    except ImportError as e:
        return False, f"transformWithState API unavailable: {e}"
    return True, "ok"


def apply_stateful_spell(
    events: DataFrame,
    spell: StatefulSpell,
    key_cols: list[str],
    timeout: str = "NoTimeout",
    backend: str = "auto",
) -> DataFrame:
    """Run a stateful spell per key over a (streaming) DataFrame.

    The state dict is persisted as a tuple matching ``state_schema`` field
    order; emitted rows follow ``output_schema``.

    ``backend``: 'auto' uses the typed transformWithStateInPandas backend
    when the runtime probe passes, else applyInPandasWithState; 'typed' /
    'applyInPandas' force one.
    """
    if backend not in ("auto", "typed", "applyInPandas"):
        raise ValueError(f"unknown backend {backend!r}")
    if backend == "typed" or (backend == "auto" and typed_state_backend_available()[0]):
        return _apply_typed_state(events, spell, key_cols)
    state_fields = [f.name for f in spell.state_schema.fields]
    out_fields = [f.name for f in spell.output_schema.fields]
    init, update, emit = spell.init, spell.update, spell.emit
    order_by = spell.order_by

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            st = dict(zip(state_fields, state.get))
        else:
            st = init()
        if order_by:
            # Order-sensitive fold: a key's micro-batch may arrive as
            # several arbitrary-order chunks (arrow maxRecordsPerBatch
            # splits large groups), so sort the WHOLE batch once and fold
            # it in a single update call.
            chunks = list(pdf_iter)
            if chunks:
                whole = pd.concat(chunks, ignore_index=True)
                st = update(st, whole.sort_values(order_by, ignore_index=True))
        else:
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


def _apply_typed_state(
    events: DataFrame, spell: StatefulSpell, key_cols: list[str]
) -> DataFrame:
    """transformWithStateInPandas backend: same StatefulSpell semantics
    over a typed ValueState (RocksDB-backed on a cluster, TTL/timers
    available for future spells). Only reachable when
    ``typed_state_backend_available()`` passes."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    state_fields = [f.name for f in spell.state_schema.fields]
    out_fields = [f.name for f in spell.output_schema.fields]
    init, update, emit = spell.init, spell.update, spell.emit
    state_schema = spell.state_schema
    order_by = spell.order_by

    class _SpellProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("spell_state", state_schema)

        def handleInputRows(self, key, rows, timer_values):
            st = (
                dict(zip(state_fields, self._state.get()))
                if self._state.exists()
                else init()
            )
            if order_by:
                chunks = list(rows)
                if chunks:
                    whole = pd.concat(chunks, ignore_index=True)
                    st = update(st, whole.sort_values(order_by, ignore_index=True))
            else:
                for pdf in rows:
                    st = update(st, pdf)
            self._state.update(tuple(st[f] for f in state_fields))
            row = emit(key, st)
            if row is not None:
                yield pd.DataFrame({f: [row.get(f)] for f in out_fields})

        def close(self) -> None:
            pass

    return events.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=_SpellProcessor(),
        outputStructType=spell.output_schema,
        outputMode="Update",
        timeMode="None",
    )


def kv_store_spell(value_col: str = "value") -> StatefulSpell:
    """Durable per-key KV store with range-query semantics.

    The reference's state roadmap asks for "SELECT * FROM state WHERE
    v > 10 AND v < 20" over spell state (reference: README.md:110 — it
    staged SQLite for this but never wired it).  Spark-first reading: the
    state store holds the KV pairs; every micro-batch emits the key's
    current aggregate snapshot, and a range query is a DataFrame filter
    over the latest snapshot — the predicate stays in Catalyst, the state
    stays in the (RocksDB-capable) store.
    """
    return StatefulSpell(
        name="kv_store",
        init=lambda: {"n": 0, "v_min": None, "v_max": None, "v_sum": 0.0},
        update=lambda st, pdf: {
            "n": st["n"] + len(pdf),
            "v_min": min(
                x for x in [st["v_min"], float(pdf[value_col].min())] if x is not None
            ),
            "v_max": max(
                x for x in [st["v_max"], float(pdf[value_col].max())] if x is not None
            ),
            "v_sum": st["v_sum"] + float(pdf[value_col].sum()),
        },
        emit=lambda key, st: {
            "user_id": key[0],
            "n": st["n"],
            "v_min": st["v_min"],
            "v_max": st["v_max"],
            "v_avg": st["v_sum"] / st["n"] if st["n"] else None,
        },
        state_schema=T.StructType(
            [
                T.StructField("n", T.LongType()),
                T.StructField("v_min", T.DoubleType()),
                T.StructField("v_max", T.DoubleType()),
                T.StructField("v_sum", T.DoubleType()),
            ]
        ),
        output_schema=T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("n", T.LongType()),
                T.StructField("v_min", T.DoubleType()),
                T.StructField("v_max", T.DoubleType()),
                T.StructField("v_avg", T.DoubleType()),
            ]
        ),
    )


def range_query_state(snapshot: DataFrame, predicate: str) -> DataFrame:
    """Range query over the latest emitted state snapshots: keep each
    key's last emission, then apply the SQL predicate (the reference's
    state range-query surface)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("n").desc())
    latest = (
        snapshot.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return latest.filter(predicate)


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


def ewma_spell(alpha: float = 0.2, value_col: str = "value") -> StatefulSpell:
    """Streaming EWMA per key — the unbounded-history form of q135.

    The batch query folds each key's full ordered history with
    ``aggregate()``; that assumes per-key history fits an executor. Here
    the recurrence lives in per-key state instead (one double + a count),
    so history length is unbounded: each micro-batch folds its rows in
    (ts, event_id) order into the carried value. Identical arithmetic —
    alpha*x + (1-alpha)*acc per row — so given time-ordered batches the
    final state equals the batch fold exactly.  ``order_by`` makes the
    runner assemble and sort the WHOLE per-key micro-batch before the
    fold — per-chunk sorting is not enough, since Spark may split a large
    group into several arbitrary-order chunks.
    """
    a = float(alpha)

    def update(st: dict, pdf: pd.DataFrame) -> dict:
        ew, n = st["ewma"], st["n"]
        for x in pdf[value_col].astype(float):
            ew = x if n == 0 else a * x + (1.0 - a) * ew
            n += 1
        return {"ewma": ew, "n": n}

    return StatefulSpell(
        name="ewma",
        init=lambda: {"ewma": None, "n": 0},
        update=update,
        order_by=["ts", "event_id"],
        emit=lambda key, st: {"user_id": key[0], "ewma": st["ewma"], "n": st["n"]},
        state_schema=T.StructType(
            [
                T.StructField("ewma", T.DoubleType()),
                T.StructField("n", T.LongType()),
            ]
        ),
        output_schema=T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("ewma", T.DoubleType()),
                T.StructField("n", T.LongType()),
            ]
        ),
    )
