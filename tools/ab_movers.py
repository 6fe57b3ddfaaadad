"""Idle-window A/B attribution of non-uniform bench movers (r6 verdict
task #2): run named registry queries N times in THIS process against the
sanctum_spark checked out at --repo, print one JSON line with all run
times.  Launch once per side (fresh JVM per side, the BASELINE.md
protocol):

    python tools/ab_movers.py --repo /root/repo --label head
    python tools/ab_movers.py --repo /path/to/worktree@r5 --label r5

Same warmup as bench.py (scan + shuffle + Python-worker round trip),
clearCache between runs, 5 timed runs per query after 1 discarded warm
run.  Compare by per-query MEDIAN across runs.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", required=True)
    ap.add_argument("--label", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument(
        "--queries",
        default="q104_decontamination,q158_quality_keeper,q143_compression_ratio",
    )
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from pyspark.sql import functions as F

    from sanctum_spark import queries as qreg
    from sanctum_spark.session import get_spark

    spark = get_spark(f"ab_{args.label}")
    registry = qreg.queries()

    li = spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet"))
    li.groupBy("l_returnflag").count().collect()
    spark.range(1000).select(
        F.pandas_udf(lambda s: s * 2, "long")(F.col("id"))
    ).count()

    out: dict[str, dict] = {}
    for name in args.queries.split(","):
        fn = registry[name]
        times = []
        for i in range(args.runs + 1):  # run 0 = warm, discarded
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).count()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            if i > 0:
                times.append(round(dt, 4))
        out[name] = {
            "runs": times,
            "median": round(statistics.median(times), 4),
            "min": min(times),
        }
        print(f"# {args.label} {name}: {times}", file=sys.stderr)

    print(json.dumps({"label": args.label, "repo": args.repo, "queries": out}))


if __name__ == "__main__":
    main()
