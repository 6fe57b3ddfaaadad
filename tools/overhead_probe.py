"""Dissect the per-query fixed overhead floor (r14 task #1).

For a sample of trivial-band queries: time construction vs action
(warm, best-of-3), count the Spark jobs/stages/tasks each count()
launches, and report where the per-query ~0.2 s goes.

Usage: python tools/overhead_probe.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sanctum_spark.session import get_spark  # noqa: E402
from sanctum_spark import queries as qreg  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "q06_revenue_filter",   # trivial scan-agg
    "q12_outer_join_fill",  # small join
    "q21_window_running",   # one window
    "q42_union_by_name",    # union
    "q55_null_functions",   # projection
    "q151_chi2_independence",  # chatty builder
    "q152_cep_pattern",     # chatty builder
    "q157_shard_manifest",  # chatty builder
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark("overhead_probe")
    sc = spark.sparkContext
    reg = qreg.queries()

    # warm: same warm-up as bench.py
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    li.groupBy("l_returnflag").count().collect()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    st = sc.statusTracker()

    print(f"{'query':32s} {'build_ms':>9s} {'count_ms':>9s} {'jobs':>5s} {'stages':>7s} {'tasks':>6s}")
    for name in names:
        fn = reg[name]
        # warm run first (codegen+page cache) so we measure the steady floor
        fn(spark, SF_DIR).count()
        spark.catalog.clearCache()

        best_build = best_count = None
        jobs = stages = tasks = 0
        for _ in range(3):
            j0 = set(st.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            j1 = set(st.getJobIdsForGroup(None) or [])
            new_jobs = j1 - j0
            n_stages = n_tasks = 0
            for jid in new_jobs:
                ji = st.getJobInfo(jid)
                if ji:
                    for sid in ji.stageIds:
                        si = st.getStageInfo(sid)
                        if si and si.numCompletedTasks > 0:
                            n_stages += 1
                            n_tasks += si.numCompletedTasks
            b, c = (t1 - t0) * 1000, (t2 - t1) * 1000
            if best_count is None or c < best_count:
                best_count, best_build = c, b
                jobs, stages, tasks = len(new_jobs), n_stages, n_tasks
            spark.catalog.clearCache()
        print(f"{name:32s} {best_build:9.1f} {best_count:9.1f} {jobs:5d} {stages:7d} {tasks:6d}")

    spark.stop()


if __name__ == "__main__":
    main()
