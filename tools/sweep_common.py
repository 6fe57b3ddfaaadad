"""Shared harness for the robustness sweep tools (empty / degenerate /
unicode / extreme): runs every registered query against a crafted
sf-dir, compares oracle-paired ones driver-style (columns sorted by
name, rows sorted by stringified values, string equality), and prints
the problem set + a one-line summary.

Each tool builds its fixture directory and calls :func:`run_sweep`.
The fast regression cores live in tests/ (test_empty_input.py,
test_edge_invariants_b9/b10.py); these tools are the full-registry
evidence pass.
"""

from __future__ import annotations

import json
import os

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

SRC = os.environ.get("SANCTUM_TEST_SF_DIR", "/root/testdata/sf0.001")


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1).astype(str)
    if len(df) == 0:
        return df.reset_index(drop=True)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def run_sweep(sf: str, app_name: str = "sweep") -> dict:
    """Run all registered queries against ``sf``; return {name: status}."""
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    import duckdb

    import sanctum_spark.queries as qreg
    from sanctum_spark.session import get_spark

    qreg.load_all_modules()
    spark = get_spark(app_name)
    results = {}
    for name, q in qreg.REGISTRY.items():
        try:
            got = q.fn(spark, sf).toPandas()
            spark_err = None
        except Exception as ex:  # noqa: BLE001 - sweep records, not raises
            got, spark_err = None, f"{type(ex).__name__}: {str(ex)[:140]}"
        oracle_err, want = None, None
        if q.oracle:
            try:
                con = duckdb.connect()
                for t in TABLES:
                    con.execute(
                        f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sf}/{t}.parquet')"
                    )
                want = con.sql(q.oracle).df()
            except Exception as ex:  # noqa: BLE001
                oracle_err = f"{type(ex).__name__}: {str(ex)[:140]}"
        status = "ok"
        if spark_err:
            status = "SPARK_CRASH"
        elif oracle_err:
            status = "ORACLE_ERR"
        elif want is not None:
            try:
                status = (
                    "match"
                    if canon(got).equals(canon(want))
                    else f"MISMATCH({len(got)}vs{len(want)})"
                )
            except Exception as ex:  # noqa: BLE001
                status = f"compare_err:{str(ex)[:60]}"
        results[name] = {
            "status": status, "spark_err": spark_err, "oracle_err": oracle_err
        }
    bad = {k: v for k, v in results.items() if v["status"] not in ("match", "ok")}
    print(json.dumps(bad, indent=1))
    n_match = sum(1 for v in results.values() if v["status"] == "match")
    n_ok = sum(1 for v in results.values() if v["status"] == "ok")
    print(
        f"summary: {len(results)} queries; {n_match} match; "
        f"{n_ok} rows-only ok; {len(bad)} problems"
    )
    print("sf:", sf)
    return results
