"""Streaming complex-event processing: the q152 pattern as a per-key NFA
over ``applyInPandasWithState``.

Batch q152 proves the pattern (view -> first click -> first purchase,
all within a deadline; skip-till-next-row) collapses to window algebra —
but that form needs unbounded-FOLLOWING frames, which cannot stream.
The streaming form is the classic CEP shape instead (cf. EDBT 2024
"Bridging the Gap: Complex Event Processing on Stream Processing
Systems", PAPERS.md): per-key NFA state carried across micro-batches.

State per user (bounded by the pattern deadline, watermark-style):
- ``pv``: view timestamps awaiting their first click;
- ``ppv``/``ppc``: parallel arrays of (view_ts, click_ts) partial
  matches awaiting their first purchase.
A click closes EVERY pending view (pending entries are from earlier
rows, so this click is each one's first-following click — row order,
equal timestamps included); a purchase closes every pending pair the
same way.  Completions violating the deadline are dropped,
and pending entries whose deadline passed the key's max seen event time
are pruned — state never grows beyond one deadline-window of views.

Ordering contract: events must arrive in (ts_ns, event_id) order per
key across micro-batches (sources.stage_event_stream buckets and sorts
on exactly that key pair, so equal-timestamp ties never split across
files in inverted order).  Out-of-order arrival needs a watermark buffer in front;
within a micro-batch the runner sorts the whole batch (chunks are
concatenated first — applyInPandasWithState splits large groups).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MATCH_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("view_ts", T.LongType()),
        T.StructField("click_ts", T.LongType()),
        T.StructField("purchase_ts", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("pv", T.ArrayType(T.LongType())),
        T.StructField("ppv", T.ArrayType(T.LongType())),
        T.StructField("ppc", T.ArrayType(T.LongType())),
    ]
)


def streaming_cep_pattern(events: DataFrame, window_ns: int) -> DataFrame:
    """view -> click -> purchase matches (q152 semantics) from a stream.

    Emits each completed match exactly once, in the micro-batch where its
    purchase arrives.

    "First following" is ROW order — (ts_ns, event_id), exactly batch
    q152's frame ordering — not timestamp inequality: every pending entry
    in state is, by construction, from an earlier row, so a click is the
    first-following click for ALL pending views (equal-timestamp ties
    included).  A deadline-violating first-follower kills its pattern
    instance permanently (a later click/purchase would not be the FIRST).

    State hygiene: empty state is removed (idle keys whose patterns all
    resolved hold no state-store entry).  A key that goes quiet with
    still-pending partials keeps at most one deadline-window of them; a
    production deployment would add an event-time timeout to reap those —
    noted rather than implemented because availableNow test triggers
    cannot observe timeouts deterministically."""

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        (uid,) = key
        pv, ppv, ppc = ([], [], []) if not state.exists else [
            list(x) for x in state.get
        ]
        chunks = list(pdf_iter)
        out = []
        if chunks:
            whole = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts_ns", "event_id"]
            )
            for ts, typ in zip(whole["ts_ns"], whole["event_type"]):
                ts = int(ts)
                if typ == "view":
                    pv.append(ts)
                elif typ == "click":
                    # first following click for every pending view: match
                    # within deadline, dead otherwise — either way resolved
                    for v in pv:
                        if ts <= v + window_ns:
                            ppv.append(v)
                            ppc.append(ts)
                    pv = []
                elif typ == "purchase":
                    for v, c in zip(ppv, ppc):
                        if ts <= v + window_ns:
                            out.append((uid, v, c, ts))
                    ppv, ppc = [], []
                # prune anything that can no longer complete (state bound)
                pv = [v for v in pv if v + window_ns >= ts]
                keep = [
                    i for i, v in enumerate(ppv) if v + window_ns >= ts
                ]
                ppv = [ppv[i] for i in keep]
                ppc = [ppc[i] for i in keep]
        if pv or ppv:
            state.update((pv, ppv, ppc))
        elif state.exists:
            state.remove()
        yield pd.DataFrame(
            out, columns=["user_id", "view_ts", "click_ts", "purchase_ts"]
        )

    return (
        events.select("user_id", "ts_ns", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=MATCH_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
