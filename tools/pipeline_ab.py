"""Fused-vs-staged A/B and octave slopes for the curation pipeline.

r10 verdict task #4: SCALE.md measures the curation operators
individually; a real 100 TB pre-training run chains
clean → exact dedup → MinHash-edge clustering → decontaminate → pack as
ONE job with a shared scan.  This runner measures that composition
(sanctum_spark/operators/curation.py::curate_and_pack — output equality
with staged execution is suite-pinned in tests/test_curation_pipeline.py)
three ways:

1. ``--fused-vs-staged [sf_dir [rounds]]`` — interleaved F S F S ...
   timing of the fused chain vs stage-at-a-time parquet materialization
   (what a naive orchestrator pays between jobs), same drift-robust
   paired-rounds protocol as tools/octave_ab.py.
2. ``--ab A_dir B_dir [rounds]`` — interleaved A B A B octave ratio of
   the FUSED pipeline (median per-round ratio).
3. Every mode plan-signature-diffs the sides (join-type + Exchange
   counts from the AQE-final executedPlan) so a cross-octave ratio is
   never read across an unnoticed plan-regime flip (the q05 class,
   [[octave-regime-flips]] protocol; signatures cover the post-CC
   segment of the chain — the CC iteration localCheckpoints, which
   truncates lineage by design).

Benchmark side uses the PRODUCTION decontamination shape (fixed eval
suite: doc_id % 97 == 0 AND doc_id < 5000 — constant 52 docs at every
derived octave, tools/octave_ab.py::_q104_fixed_bench rationale).

Prints one JSON line.  Scratch parquet goes under <repo>/.tmp
(gitignored) and is removed afterwards.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PARAMS = dict(
    min_tokens=10, min_chars=100, max_chars=20000,
    n_hashes=16, bands=4, shingle_k=3, neardup_threshold=0.4,
    decontam_k=3, decontam_threshold=0.05,
    pack_budget=512, pack_block=64,
)


def _split(spark, sf_dir):
    from pyspark.sql import functions as F

    from sanctum_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    is_bench = (F.col("doc_id") % 97 == 0) & (F.col("doc_id") < 5000)
    bench = docs.filter(is_bench).select("doc_id", "text")
    corpus = docs.filter(~is_bench).select("doc_id", "text")
    return corpus, bench


def fused(spark, sf_dir):
    from sanctum_spark.operators.curation import curate_and_pack

    corpus, bench = _split(spark, sf_dir)
    return curate_and_pack(corpus, bench, **PARAMS)


def staged(spark, sf_dir, tmp):
    """Stage-at-a-time: each stage materialized to parquet and read back."""
    from sanctum_spark.operators import curation as C

    def roundtrip(df, name):
        path = os.path.join(tmp, name)
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    corpus, bench = _split(spark, sf_dir)
    cleaned = roundtrip(
        C.clean_corpus(corpus, min_tokens=PARAMS["min_tokens"],
                       min_chars=PARAMS["min_chars"],
                       max_chars=PARAMS["max_chars"]),
        "cleaned",
    )
    uniq = roundtrip(
        C.drop_near_duplicate_docs(
            cleaned, n_hashes=PARAMS["n_hashes"], bands=PARAMS["bands"],
            shingle_k=PARAMS["shingle_k"],
            threshold=PARAMS["neardup_threshold"]),
        "uniq",
    )
    final = roundtrip(
        C.drop_contaminated_docs(uniq, bench, k=PARAMS["decontam_k"],
                                 threshold=PARAMS["decontam_threshold"]),
        "final",
    )
    return C.pack_sequences(final, budget=PARAMS["pack_budget"],
                            block=PARAMS["pack_block"])


def plan_signature(df) -> dict[str, int]:
    """Join-type/Exchange counts from the AQE-final executedPlan (the df's
    OWN QueryExecution must have been executed — see _timed_count, which
    runs that exact plan; ``df.count()`` would execute a derived aggregate
    Dataset instead and leave this plan pre-AQE, blinding the signature to
    runtime join-strategy flips, the q05 class this tool exists to catch).
    Window-independent: counts plan shape, not timings."""
    jdf = df._jdf
    plan = jdf.queryExecution().executedPlan().toString()
    if "AdaptiveSparkPlan" in plan:
        assert "isFinalPlan=true" in plan, (
            "plan_signature read a pre-AQE plan; execute the df's own "
            "QueryExecution first (e.g. via _timed_count)"
        )
    sig: dict[str, int] = {}
    for op in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
               "BroadcastNestedLoopJoin", "Exchange", "HashAggregate",
               "ObjectHashAggregate", "SortAggregate", "Window"):
        n = len(re.findall(rf"\b{op}\b", plan))
        if n:
            sig[op] = n
    return sig


def _timed_count(make_df) -> tuple[float, int, dict[str, int]]:
    t0 = time.perf_counter()
    df = make_df()
    # Execute the df's OWN QueryExecution (a JVM-side RDD action on the very
    # plan plan_signature reads, no rows shipped to Python) so the signature
    # sees the AQE-final plan; df.count() executes a derived aggregate
    # Dataset and would leave df's executedPlan at its initial shape.
    n = df._jdf.queryExecution().executedPlan().execute().count()
    dt = time.perf_counter() - t0
    sig = plan_signature(df)
    return dt, n, sig


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from sanctum_spark.session import get_spark

    mode = sys.argv[1] if len(sys.argv) > 1 else "--fused-vs-staged"
    spark = get_spark("pipeline_ab")
    tmp = os.path.join(REPO_ROOT, ".tmp", f"pipeline_ab_{os.getpid()}")
    os.makedirs(tmp, exist_ok=True)
    out: dict[str, object] = {"cpus": os.environ["SPARK_GRAFT_CPUS"]}

    def clear():
        spark.catalog.clearCache()

    try:
        if mode == "--fused-vs-staged":
            sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
                REPO_ROOT, ".scalefix", "sf0.4")
            rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
            out["sf_dir"] = sf_dir
            # warm both sides once (codegen, page cache, python workers)
            _timed_count(lambda: fused(spark, sf_dir)); clear()
            _timed_count(lambda: staged(spark, sf_dir, tmp)); clear()
            pairs, sig_f, sig_s, n_f, n_s = [], None, None, None, None
            for _ in range(rounds):
                tf, n_f, sig_f = _timed_count(lambda: fused(spark, sf_dir))
                clear()
                ts, n_s, sig_s = _timed_count(
                    lambda: staged(spark, sf_dir, tmp))
                clear()
                pairs.append((tf, ts))
                print(f"# fused {tf:.2f}s staged {ts:.2f}s", file=sys.stderr)
            assert n_f == n_s, (n_f, n_s)
            out.update({
                "rows": n_f,
                "fused_med": round(statistics.median(p[0] for p in pairs), 3),
                "staged_med": round(statistics.median(p[1] for p in pairs), 3),
                "staged_over_fused": round(
                    statistics.median(p[1] / p[0] for p in pairs), 2),
                "fused_sig": sig_f,
                "staged_final_stage_sig": sig_s,
            })
        elif mode == "--ab":
            a_dir, b_dir = sys.argv[2], sys.argv[3]
            rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
            out.update({"a_dir": a_dir, "b_dir": b_dir})
            _timed_count(lambda: fused(spark, a_dir)); clear()
            _timed_count(lambda: fused(spark, b_dir)); clear()
            pairs, sig_a, sig_b = [], None, None
            for _ in range(rounds):
                ta, _, sig_a = _timed_count(lambda: fused(spark, a_dir))
                clear()
                tb, _, sig_b = _timed_count(lambda: fused(spark, b_dir))
                clear()
                pairs.append((ta, tb))
                print(f"# A {ta:.2f}s B {tb:.2f}s", file=sys.stderr)
            out.update({
                "a_med": round(statistics.median(p[0] for p in pairs), 3),
                "b_med": round(statistics.median(p[1] for p in pairs), 3),
                "ratio_med": round(
                    statistics.median(p[1] / p[0] for p in pairs), 2),
                "a_sig": sig_a,
                "b_sig": sig_b,
                "plan_regime_flip": sig_a != sig_b,
            })
        else:
            sys.exit(f"unknown mode {mode!r} "
                     "(--fused-vs-staged | --ab A_dir B_dir)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
