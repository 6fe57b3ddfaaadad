"""r14 spread_scan sweep over NON-documents tables (guide §2.5/§6).

r13 swept only documents-table queries; the probe (r14) shows heavy
serial single-row-group scans on lineitem/orders/events too (q128 713 ms
in ONE job, q29/q04/q18...).  This sweep monkeypatches io.load_table to
fan a chosen table out to session parallelism and measures each
candidate with an INTERLEAVED paired A/B in one JVM (old, new, old,
new... cache cleared between runs, median of pair ratios) — the r13
discipline for a co-tenant-noisy host.

Usage: python tools/spread_sweep_r14.py [qname=table ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sanctum_spark.io as io  # noqa: E402
from sanctum_spark.session import get_spark  # noqa: E402
from sanctum_spark import queries as qreg  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# query -> table whose scan to fan out (the table carrying the heavy
# fused derivation / serial partial-agg in that query's first stage)
CANDIDATES: dict[str, str] = {
    "q128_zorder_key": "orders",
    "q29_min_cost_supplier": "part",
    "q04_order_priority": "lineitem",
    "q18_big_orders": "lineitem",
    "q41_except_union": "lineitem",
    "q39_last_shipper": "lineitem",
    "q03_shipping_priority": "lineitem",
    "q35_returned_revenue": "lineitem",
    "q37_ship_delay_buckets": "lineitem",
    "q13_range_join": "lineitem",
    "q01_pricing_summary": "lineitem",
    "q103_map_zip_with": "events",
    "q61_json_props": "events",
    "q84_spell_fanout_udtf": "events",
    "q90_multimodal_features": "documents",
    "q125_quality_classifier": "documents",
    "q101_vocab_bigrams": "documents",
    "q115_fuzzy_vocab": "documents",
    "q38_excess_volume_suppliers": "lineitem",
    "q106_tfidf_terms": "documents",
}

PAIRS = 4


def main() -> None:
    args = dict(a.split("=", 1) for a in sys.argv[1:]) or CANDIDATES
    spark = get_spark("spread_sweep_r14")
    reg = qreg.queries()

    real_load = io.load_table
    spread_table = {"name": None}

    def patched(spark_, sf_dir_, name_):
        df = real_load(spark_, sf_dir_, name_)
        if name_ == spread_table["name"]:
            df = df.repartition(spark_.sparkContext.defaultParallelism)
        return df

    # patch at io and at every queries module that imported the symbol
    import sanctum_spark.queries as qpkg

    mods = [io] + [
        getattr(qpkg, m)
        for m in dir(qpkg)
        if hasattr(getattr(qpkg, m, None), "load_table")
    ]
    for m in mods:
        m.load_table = patched

    from pyspark.sql import functions as F  # noqa: F401

    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).groupBy(
        "l_returnflag"
    ).count().collect()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    out = {}
    for name, table in args.items():
        fn = reg[name]
        # warm both variants once
        for mode in (None, table):
            spread_table["name"] = mode
            fn(spark, SF_DIR).count()
            spark.catalog.clearCache()
        ratios, olds, news = [], [], []
        for _ in range(PAIRS):
            ab = {}
            for mode in (None, table):
                spread_table["name"] = mode
                t0 = time.perf_counter()
                fn(spark, SF_DIR).count()
                ab[mode] = time.perf_counter() - t0
                spark.catalog.clearCache()
            ratios.append(ab[table] / ab[None])
            olds.append(ab[None])
            news.append(ab[table])
        med = statistics.median(ratios)
        out[name] = {
            "table": table,
            "median_ratio": round(med, 3),
            "old_s": [round(x, 3) for x in olds],
            "new_s": [round(x, 3) for x in news],
        }
        print(f"{name:34s} {table:10s} ratio {med:.3f}  old {olds}  new {news}",
              flush=True)
        spread_table["name"] = None
    json.dump(out, open("/tmp/spread_sweep_r14.json", "w"), indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
