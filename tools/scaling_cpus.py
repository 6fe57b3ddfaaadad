"""Core-count scaling curve (r14, VERDICT task #2): the same queries at
local[8] vs local[32] on an SF where compute dominates the per-job floor.

At sf0.1 the 159-query median is ~0.2 s of fixed per-job overhead
(driver planning + action latency), which does not scale with cores —
so the driver's whole-suite c8/c32 ratio reads ~1 and scaling is
illegible.  This tool measures the ratio where it is meaningful: the
compute-dominant queries at sf0.4 (derived fixture,
tools/gen_scale_fixtures.py).  The bench JSON's ``cpus``/``master``
keys (added r14) carry the effective parallelism for the driver.

Usage:
    python tools/scaling_cpus.py                 # parent: runs both core counts
    python tools/scaling_cpus.py --child <cpus>  # child-process mode

Writes SCALING_r14.json: per-query medians at each core count plus the
speedup ratio c32/c8.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.path.join(REPO, ".scalefix", "sf0.4")

# Compute-dominant set (parallel stages carry the time), plus two
# floor-dominated trivial queries as the expected-flat contrast.
QUERIES = [
    "q88_user_correlation",
    "q114_textrank_keywords",
    "q99_dedup_clusters",
    "q158_quality_keeper",
    "q161_entity_resolution",
    "q75_simhash_pairs",
    "q121_cross_corpus_neardup",
    "q104_decontamination",
    "q81_spell_loop",
    "q90_multimodal_features",
    # floor-dominated contrast rows (expected ratio ~1):
    "q06_revenue_filter",
    "q24_first_last",
]


def child(cpus: int) -> None:
    sys.path.insert(0, REPO)
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from sanctum_spark.session import get_spark
    from sanctum_spark import queries as qreg

    spark = get_spark(f"scaling_c{cpus}")
    reg = qreg.queries()
    out: dict[str, float] = {}
    for name in QUERIES:
        fn = reg[name]
        fn(spark, SF_DIR).count()  # warm (codegen + page cache)
        spark.catalog.clearCache()
        ts = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            ts.append(time.time() - t0)
            spark.catalog.clearCache()
        out[name] = round(statistics.median(ts), 4)
    print(json.dumps({"cpus": cpus, "queries": out}))


def _wait_quiet(max_wait_s: int = 1200) -> list[float]:
    """Block until the host co-tenant load subsides (this sandbox's
    1-minute loadavg swings 1-12 on a multi-minute cycle, documented
    since r10); a curve taken in a loud window inverts — local[32]
    oversubscribes against the co-tenant while local[8] hides in the
    slack.  Returns the loadavg triple the run started with."""
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        la = os.getloadavg()
        if la[0] < 2.0 and la[1] < 4.0:
            return list(la)
        time.sleep(20)
    return list(os.getloadavg())


def parent() -> None:
    results = {}
    windows = {}
    for cpus in (8, 32):
        la_start = _wait_quiet()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cpus)],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = p.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)["queries"]
        windows[cpus] = {
            "loadavg_start": la_start,
            "loadavg_end": list(os.getloadavg()),
        }
    rows = {}
    for q in QUERIES:
        c8, c32 = results[8][q], results[32][q]
        rows[q] = {"c8_sec": c8, "c32_sec": c32, "speedup": round(c8 / c32, 3)}
    art = {
        "sf_dir": SF_DIR,
        "note": (
            "median of 3 warm runs, fresh JVM per core count; derived "
            "sf0.4 fixture (gen_scale_fixtures.py). Trivial-band rows "
            "are the floor-dominated contrast. loadavg is the external "
            "co-tenant window; a loud window inverts the curve."
        ),
        "windows": windows,
        "rows": rows,
    }
    with open(os.path.join(REPO, "SCALING_r14.json"), "w") as f:
        json.dump(art, f, indent=2)
    print(json.dumps(art, indent=2))


if __name__ == "__main__":
    if "--child" in sys.argv:
        child(int(sys.argv[sys.argv.index("--child") + 1]))
    else:
        parent()
