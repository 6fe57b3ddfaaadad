"""Arrow-batch-size invariance sweep (tenth robustness family).

The nine existing families perturb data content, physical layout, and
execution strategy — none perturbs the ARROW BATCH BOUNDARY.  Every
Python-boundary operator (scalar ``pandas_udf``, ``mapInPandas``,
``mapInArrow``, UDTF eval) receives its input as a stream of Arrow
batches whose size is an ENGINE TUNABLE (``spark.sql.execution.arrow.
maxRecordsPerBatch`` — 131072 in this repo's sessions, 10000 stock, and
anything at all on a real cluster where memory pressure or a different
operator upstream changes batching).  Correct operators are pure
per-row (scalar UDFs) or explicitly batch-iterating (mapInPandas);
a bug in this axis looks like: a "vectorized" cast normalizing by a
batch-local mean, state carried across ``yield`` without per-key
grouping, first/last-row-of-batch special-casing.  Such a bug passes
every content/layout sweep (those hold batch size fixed) and then
returns DIFFERENT ANSWERS at scale.

Run A: session defaults (maxRecordsPerBatch=131072 — at sf0.001 every
       Python boundary sees exactly one batch per partition).
Run B: maxRecordsPerBatch=7 — every boundary sees many tiny batches,
       so any cross-batch assumption must change the answer.

Both runs over the SAME tables; comparison is the driver-style canon
(columns sorted by name, rows sorted by stringified values, string
equality) — Spark-vs-Spark, since the invariance claim is internal.

Grouped-map (``applyInPandas``) semantics present one DataFrame per
GROUP regardless of wire batching, so this axis exercises it only at
the transport layer; the per-group contract is covered by the layout
sweep's partition-count perturbation.

Usage: PYTHONPATH=. python tools/batchsize_sweep.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

from tools.sweep_common import SRC, canon

TINY_BATCH = "7"


def run_registry(spark, sf: str) -> dict:
    import sanctum_spark.queries as qreg

    out = {}
    for name, q in qreg.REGISTRY.items():
        try:
            out[name] = canon(q.fn(spark, sf).toPandas())
        except Exception as ex:  # noqa: BLE001 - sweep records, not raises
            out[name] = f"CRASH {type(ex).__name__}: {str(ex)[:140]}"
    return out


def main() -> int:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

    import sanctum_spark.queries as qreg
    from sanctum_spark.session import get_spark

    qreg.load_all_modules()
    spark = get_spark("batchsize_sweep")

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    base = run_registry(spark, SRC)

    saved = spark.conf.get(key)
    spark.conf.set(key, TINY_BATCH)
    try:
        tiny = run_registry(spark, SRC)
    finally:
        spark.conf.set(key, saved)

    bad = {}
    for name in base:
        a, b = base[name], tiny[name]
        if isinstance(a, str) or isinstance(b, str):
            bad[name] = {"a": a if isinstance(a, str) else "ok",
                         "b": b if isinstance(b, str) else "ok"}
        elif not a.equals(b):
            bad[name] = {"a": f"{len(a)} rows", "b": f"{len(b)} rows",
                         "diff": "batch-size-dependent values"}
    print(json.dumps(bad, indent=1))
    print(
        f"summary: {len(base)} queries; {len(base) - len(bad)} "
        f"batch-size-invariant (batch={TINY_BATCH} vs default); "
        f"{len(bad)} problems"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
