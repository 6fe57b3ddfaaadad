"""Capture .explain("formatted") for named queries into plans/<dir>/.

Usage: python tools/capture_plans.py <label> [query ...]
  label  - suffix for the plan files: plans/<SPARK_GRAFT_PLAN_DIR default r14>/<query>_<label>.txt
           (use "before" / "after" per the optimization-round contract)
  query  - registry names; default: the top-slowest set tracked in r13.

Runs each query's DataFrame build only (no action), writes the formatted
plan.  The AQE-final plan differs; these files record the static plan the
optimizer produced, which is what code-level claims (join strategy,
exchange count, PushedFilters, Python-eval nodes) are checked against.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = [
    "q88_user_correlation",
    "q85_grouped_map_normalize",
    "q158_quality_keeper",
    "q114_textrank_keywords",
    "q99_dedup_clusters",
    "q119_pq_ann",
    "q161_entity_resolution",
    "q142_cross_source_overlap",
    "q122_lm_score",
    "q79_embedding_neardup",
    "q104_decontamination",
    "q81_spell_loop",
    "q38_excess_volume_suppliers",
    "q147_heavy_hitters",
    "q162_bm25_topk",
]


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_DIR", "r14"))
    os.makedirs(out_dir, exist_ok=True)

    from sanctum_spark.session import get_spark
    from sanctum_spark import queries as qreg

    spark = get_spark("capture_plans")
    registry = qreg.queries()
    for name in names:
        fn = registry[name]
        spark.sparkContext.setJobDescription(f"plan: {name}")
        df = fn(spark, sf_dir)
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{label}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
