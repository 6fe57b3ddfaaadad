"""Empirical scaling curve (r6 verdict task #3): run the headline query
families at sf0.01 / 0.05 / 0.1 / 0.2 / 0.4 and measure the wall-time slope,
converting SCALE.md's plan-shape arguments into measured evidence over
two octaves.

sf0.01/0.1 are the driver's tables; sf0.05/0.2/0.4 are derived from sf0.1 by
tools/gen_scale_fixtures.py (run it first).  One fresh JVM per scale
factor (bench.py's warmup), 1 discarded warm run + 3 timed runs per
query, medians.

Usage:
    python tools/scaling_curve.py              # all four SFs, prints JSON
    python tools/scaling_curve.py --sf <dir>   # one SF (child-process mode)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

QUERIES = [
    "q01_pricing_summary",
    "q05_local_supplier_volume",
    "q70_exact_dedup",
    "q74_minhash_lsh_pairs",
    "q99_dedup_clusters",
    "q104_decontamination",
    "q108_sequence_packing",
    "q142_cross_source_overlap",
    "q146_embedding_clusters",
    "q152_cep_pattern",
]

SFS = [
    (0.01, "/root/testdata/sf0.01"),
    (0.05, "/root/repo/.scalefix/sf0.05"),
    (0.1, "/root/testdata/sf0.1"),
    (0.2, "/root/repo/.scalefix/sf0.2"),
    (0.4, "/root/repo/.scalefix/sf0.4"),
]


def run_one_sf(sf_dir: str, runs: int = 3) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from sanctum_spark import queries as qreg
    from sanctum_spark.session import get_spark

    spark = get_spark("scaling_curve")
    registry = qreg.queries()
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.groupBy("l_returnflag").count().collect()
    spark.range(1000).select(
        F.pandas_udf(lambda s: s * 2, "long")(F.col("id"))
    ).count()
    out = {}
    for name in QUERIES:
        fn = registry[name]
        times = []
        for i in range(runs + 1):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            if i > 0:
                times.append(dt)
        out[name] = round(statistics.median(times), 4)
        print(f"# {sf_dir} {name}: {out[name]}", file=sys.stderr)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    if args.sf:
        print(json.dumps(run_one_sf(args.sf, args.runs)))
        return
    results = {}
    for sf, d in SFS:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--sf", d,
             "--runs", str(args.runs)],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        if p.returncode != 0:
            print(p.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"sf {sf} failed")
        results[str(sf)] = json.loads(p.stdout.strip().splitlines()[-1])
    # slope table: consecutive-point time ratios vs size ratios
    table = {}
    sfs = [s for s, _ in SFS]
    for q in QUERIES:
        ts = [results[str(s)][q] for s in sfs]
        ratios = [round(ts[i + 1] / ts[i], 2) for i in range(len(ts) - 1)]
        table[q] = {"medians_sec": ts, "step_ratios": ratios,
                    "top_octave_ratio": ratios[-1]}
    print(json.dumps({"sfs": sfs, "queries": table}, indent=1))


if __name__ == "__main__":
    main()
