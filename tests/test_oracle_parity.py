"""Mirror of the driver's correctness gate: every registered query runs on
Spark AND its DuckDB oracle at sf0.001; results must match exactly after
sorting columns by name and rows by value (the driver hash-compares the
same way at sf0.01)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from sanctum_spark import queries as qreg

qreg.load_all_modules()
ORACLE_QUERIES = sorted(n for n, q in qreg.REGISTRY.items() if q.oracle is not None)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    from sanctum_spark.io import TABLES

    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df.reset_index(drop=True)
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    q = qreg.REGISTRY[name]
    got = canon(q.fn(spark, sf_dir).toPandas())
    con = duck_con(sf_dir)
    want = canon(con.sql(q.oracle).df())
    con.close()
    assert len(got) == len(want), f"{name}: rows {len(got)} != oracle {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


def test_registry_consistency():
    names = set(qreg.queries().keys())
    oracle_names = set(qreg.oracle_sql().keys())
    assert oracle_names <= names


def test_rotation_invariants():
    """The driver verifies the FIRST 50 registry entries; the rotation
    (VERIFY_FIRST) must stay exactly 50 unique registered names leading
    queries(), and the registry stays frozen at 159 (r6 verdict)."""
    vf = qreg.VERIFY_FIRST
    assert len(vf) == 50 and len(set(vf)) == 50
    ordered = list(qreg.queries())
    assert len(ordered) == 159
    assert ordered[:50] == vf


def test_no_duplicate_column_names(spark, sf_dir):
    """The driver sorts columns by name before hashing — duplicate names
    would silently corrupt the compare for every query."""
    for name, q in sorted(qreg.REGISTRY.items()):
        cols = q.fn(spark, sf_dir).columns
        assert len(set(cols)) == len(cols), (name, cols)
