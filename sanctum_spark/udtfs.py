"""Native Python UDTFs (Spark 4 `pyspark.sql.functions.udtf`).

The reference's N:M event transform (docunomicon/README.md:131 — one
input event producing 0..N output events) exists in this engine in two
forms: the Arrow-batched `mapInPandas` path (q84, the high-throughput
shape) and these first-class table functions, which are directly usable
from SQL as lateral joins (`SELECT ... FROM t, LATERAL fn(t.col)`) —
the form a SQL-surface user of the engine reaches for.

Row-at-a-time Python — the flexibility tier, not the hot path; the
mapInPandas equivalents stay the 100 TB default (SCALE.md).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_WS = re.compile(r"\s+")


@udtf(returnType="pos: int, token: string")
class TokenizeUDTF:
    """1 text → N (position, token) rows; 1-based positions, empty
    tokens dropped before numbering (so positions are gap-free)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        toks = [t for t in _WS.split(str(text).lower().strip()) if t]
        for i, t in enumerate(toks, start=1):
            yield i, t


@udtf(returnType="n: int, emitted: double")
class DecayEmitUDTF:
    """The decrement-counter spell as a table function: value v emits
    rows v, v-1, ... while > 0 (bounded like the reference loop, O7)."""

    MAX_ITers = 1000

    def eval(self, value: float):  # noqa: D102
        if value is None:
            return
        v = float(value)
        n = 0
        while v > 0 and n < 1000:
            n += 1
            yield n, v
            v -= 1.0


def register_udtfs(spark) -> None:
    """Register all table functions for SQL use."""
    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    spark.udtf.register("decay_emit_udtf", DecayEmitUDTF)
