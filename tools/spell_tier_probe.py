"""Decompose the sustained vectorized-spell pipeline cost (bench.py
`_sustained_spell_tp`) into attributable components, to find whether the
Arrow/pandas boundary, the string column, the JVM filter, or the output
path dominates the ~1.8 us/row-core observed at sf0.1.

Variants (all over the same 128x-replicated cached events table,
12.8M rows, local[32]):

  A  cache_count        big.count() — cache scan + count floor
  B  jvm_filter         topic filter only, JVM-side, no Python
  C  current            bench pipeline as-is (mapInPandas, 4 cols in)
  D  no_string_in       event_type consumed JVM-side, 3 numeric cols into
                        Python — isolates Arrow string-conversion cost
  E  map_in_arrow       pyarrow.compute kernels, no pandas at all
  F  expr               zero-Python expression tier (reference point)

Each timed best-of-5 after one warm run.  Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import functions as F, types as T

sys.path.insert(0, "/root/repo")

from sanctum_spark.io import load_table  # noqa: E402
from sanctum_spark.queries.spells_q import (  # noqa: E402
    BOOST_EXPR_SPELL,
    _boost_cast_vectorized,
)
from sanctum_spark.session import get_spark  # noqa: E402
from sanctum_spark.spells.registry import Spell  # noqa: E402
from sanctum_spark.spells.runtime import apply_spell  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("boosted_value", T.DoubleType()),
    ]
)


def timed_best(fn, n_runs: int = 5) -> float:
    fn()  # warm
    best = None
    for _ in range(n_runs):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def arrow_cast(batches):
    """mapInArrow analog of _boost_cast_vectorized: filter + arithmetic via
    pyarrow.compute, strings never materialized as Python objects."""
    for b in batches:
        keep = pc.invert(pc.fill_null(pc.less(b.column("value"), 50.0), False))
        kept = b.filter(keep)
        boosted = pc.round(
            pc.multiply(kept.column("value"), 2.0), 2, round_mode="half_to_even"
        )
        yield pa.RecordBatch.from_arrays(
            [kept.column("event_id"), kept.column("user_id"), boosted],
            names=["event_id", "user_id", "boosted_value"],
        )


def main() -> None:
    spark = get_spark("spell_tier_probe")
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    rep = 128
    big = (
        ev.crossJoin(F.broadcast(spark.range(rep).toDF("rep")))
        .withColumn("event_id", F.col("event_id") * rep + F.col("rep"))
        .drop("rep")
        .repartition(32)
        .persist()
    )
    n = big.count()

    spell = Spell(
        name="boost_vec",
        cast=_boost_cast_vectorized,
        topic="purchase",
        vectorized=True,
    )

    res: dict[str, float] = {"n_rows": n}

    res["A_cache_count"] = timed_best(lambda: big.count())

    filt = big.filter(
        (F.col("event_type").isNull()) | (F.col("event_type") == "purchase")
    )
    res["B_jvm_filter"] = timed_best(lambda: filt.count())

    cur = apply_spell(big, spell, OUT_SCHEMA, topic_col="event_type")
    res["C_current"] = timed_best(lambda: cur.count())

    # D: topic filter consumed in JVM, drop the string column before the
    # Python boundary (cast here never reads event_type)
    pruned = filt.select("event_id", "user_id", "value")
    spell_d = Spell(name="boost_vec_d", cast=_boost_cast_vectorized, vectorized=True)
    d = apply_spell(pruned, spell_d, OUT_SCHEMA)
    res["D_no_string_in"] = timed_best(lambda: d.count())

    # E: mapInArrow over the pruned input (no pandas)
    e = pruned.mapInArrow(arrow_cast, schema=OUT_SCHEMA)
    res["E_map_in_arrow"] = timed_best(lambda: e.count())

    # E2: mapInArrow with the string column still present
    e2 = big.filter(
        (F.col("event_type").isNull()) | (F.col("event_type") == "purchase")
    ).mapInArrow(arrow_cast, schema=OUT_SCHEMA)
    res["E2_map_in_arrow_4col"] = timed_best(lambda: e2.count())

    f_df = apply_spell(big, BOOST_EXPR_SPELL, OUT_SCHEMA, topic_col="event_type")
    res["F_expr"] = timed_best(lambda: f_df.count())

    for k, v in list(res.items()):
        if k != "n_rows":
            res[k] = round(v, 4)
            res[k + "_ev_s"] = round(n / v)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
