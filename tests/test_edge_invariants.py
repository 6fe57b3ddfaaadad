"""Cross-engine invariants at THRESHOLD EDGES for the newest query
families (r5 verdict task 8): the sf fixtures exercise the bulk path, but
the exact boundary — a class of exactly k rows, a click landing exactly
on the CEP deadline, an SCD2 interval left open — is where Spark and the
DuckDB oracle could silently disagree.  Each test writes a crafted
events.parquet, runs the REGISTERED Spark query and its REGISTERED
oracle SQL on the same file, compares driver-style (columns sorted by
name, rows sorted by stringified values, string equality), and then pins
the expected rows so both engines being wrong together is also caught.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import sanctum_spark.queries as qreg

qreg.load_all_modules()

US = 1_000_000  # microseconds per second
HOUR_US = 3600 * US


def _write_events(tmp_path, rows):
    """rows: (event_id, ts_us_epoch, user_id, event_type, value).  Writes
    the same naive timestamp[us] encoding the generated testdata uses."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            "props": pa.array(["{}" for _ in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _both(spark, sf_dir, name):
    """(spark_df, oracle_df) for a registered query over a crafted dir,
    canonicalized the driver's way (sorted columns, stringified rows)."""
    q = qreg.REGISTRY[name]
    got = q.fn(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = con.sql(q.oracle).df()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reindex(sorted(df.columns), axis=1).astype(str)
        if len(df) == 0:
            return df.reset_index(drop=True)
        return (
            df.sort_values(by=list(df.columns)).reset_index(drop=True)
        )

    return canon(got), canon(want)


def test_q163_q164_threshold_edges(spark, tmp_path):
    """k-anonymity / distinct-individuals gates at the exact thresholds:
    k rows releases, k-1 suppresses; k rows from l-1 individuals fails
    only the q164 gate.  One QI class per user_id band, same hour."""
    from sanctum_spark.queries.pipeline7_q import K_ANON, L_DIVERSE

    t0 = 1_700_000_000 * US  # any fixed instant, naive µs epoch
    rows = []
    eid = 0
    # class A (value 10 -> band 0, type 'view'): exactly K rows, L users
    for i in range(K_ANON):
        rows.append((eid := eid + 1, t0 + i, 100 + i % L_DIVERSE, "view", 10.0))
    # class B (value 60 -> band 1): K-1 rows, plenty of users
    for i in range(K_ANON - 1):
        rows.append((eid := eid + 1, t0 + i, 200 + i, "view", 60.0))
    # class C (value 110 -> band 2): K rows but only L-1 distinct users
    for i in range(K_ANON):
        rows.append(
            (eid := eid + 1, t0 + i, 300 + i % (L_DIVERSE - 1), "view", 110.0)
        )
    sf = _write_events(tmp_path, rows)

    got, want = _both(spark, sf, "q163_k_anonymity")
    pd.testing.assert_frame_equal(got, want)
    rel163 = {
        int(float(r["value_band"])): r["released"] == "True"
        for _, r in got.iterrows()
    }
    assert rel163 == {0: True, 1: False, 2: True}

    got, want = _both(spark, sf, "q164_l_diversity")
    pd.testing.assert_frame_equal(got, want)
    rel164 = {
        int(float(r["value_band"])): r["released"] == "True"
        for _, r in got.iterrows()
    }
    # class C is k-anonymous but fails the distinct-individuals floor
    assert rel164 == {0: True, 1: False, 2: False}


def test_q152_cep_deadline_boundary(spark, tmp_path):
    """The 48h CEP deadline is INCLUSIVE (<=) on both engines: a
    purchase exactly at view_ts + 48h completes the pattern; one
    nanosecond — here one µs, the fixture grain — later does not."""
    from sanctum_spark.queries.pipeline6_q import CEP_WINDOW_NS

    t0 = 1_700_000_000 * US
    deadline_us = t0 + CEP_WINDOW_NS // 1000  # 48h after the view
    rows = [
        # user 1: click inside, purchase EXACTLY at the deadline -> match
        (1, t0, 1, "view", 1.0),
        (2, t0 + HOUR_US, 1, "click", 1.0),
        (3, deadline_us, 1, "purchase", 1.0),
        # user 2: identical but purchase one µs past the deadline -> none
        (4, t0, 2, "view", 1.0),
        (5, t0 + HOUR_US, 2, "click", 1.0),
        (6, deadline_us + 1, 2, "purchase", 1.0),
        # user 3: click exactly AT the deadline, purchase at the deadline
        # too (same-instant ordering by event_id) -> match
        (7, t0, 3, "view", 1.0),
        (8, deadline_us, 3, "click", 1.0),
        (9, deadline_us, 3, "purchase", 1.0),
    ]
    sf = _write_events(tmp_path, rows)
    got, want = _both(spark, sf, "q152_cep_pattern")
    pd.testing.assert_frame_equal(got, want)
    assert sorted(got["user_id"]) == ["1", "3"]
    u1 = got[got["user_id"] == "1"].iloc[0]
    assert int(u1["purchase_ts"]) == t0 * 1000 + CEP_WINDOW_NS


def test_q152_purchase_before_click_not_matched(spark, tmp_path):
    """Pattern ORDER matters: view -> purchase -> click (no purchase
    after the click) must NOT match even though all three occur within
    the window."""
    t0 = 1_700_000_000 * US
    rows = [
        (1, t0, 1, "view", 1.0),
        (2, t0 + HOUR_US, 1, "purchase", 1.0),
        (3, t0 + 2 * HOUR_US, 1, "click", 1.0),
    ]
    sf = _write_events(tmp_path, rows)
    got, want = _both(spark, sf, "q152_cep_pattern")
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == 0


def test_q149_scd2_open_interval_and_ties(spark, tmp_path):
    """SCD2 edges: consecutive same-state rows collapse (null-safe
    compare), the last state stays OPEN (NULL valid_to), intervals abut
    exactly ([from, to) with to == next change's from), and same-instant
    changes order deterministically by event_id."""
    t0 = 1_700_000_000 * US
    rows = [
        # user 1: A A B A  -> intervals A[t0,t2) B[t2,t3) A[t3,NULL)
        (1, t0, 1, "A", 1.0),
        (2, t0 + 1 * US, 1, "A", 1.0),
        (3, t0 + 2 * US, 1, "B", 1.0),
        (4, t0 + 3 * US, 1, "A", 1.0),
        # user 2: two changes at the SAME instant, tie-broken by event_id
        (5, t0, 2, "X", 1.0),
        (6, t0 + 1 * US, 2, "Y", 1.0),
        (7, t0 + 1 * US, 2, "Z", 1.0),
    ]
    sf = _write_events(tmp_path, rows)
    got, want = _both(spark, sf, "q149_scd2_intervals")
    pd.testing.assert_frame_equal(got, want)

    ns = lambda us: us * 1000  # noqa: E731
    u1 = got[got["user_id"] == "1"].sort_values("valid_from_ns")
    assert list(u1["state"]) == ["A", "B", "A"]
    # intervals abut exactly; the current state is open (engine NULL ->
    # pandas NaN -> 'nan' under the driver-style stringification)
    assert list(u1["valid_to_ns"]) == [
        str(float(ns(t0 + 2 * US))),
        str(float(ns(t0 + 3 * US))),
        "nan",
    ]
    u2 = got[got["user_id"] == "2"].sort_values(["valid_from_ns", "state"])
    # same-instant Y then Z: Y's interval is zero-width [t1, t1), Z open
    yz = {r["state"]: r["valid_to_ns"] for _, r in u2.iterrows()}
    assert yz["Y"] == str(float(ns(t0 + 1 * US)))
    assert yz["Z"] == "nan"


def test_q150_psi_identical_periods_zero(spark, tmp_path):
    """PSI sanity edge: identical value distributions in both periods
    give PSI == 0 exactly (Laplace smoothing keeps every log finite even
    with empty bins)."""
    t_a = pd.Timestamp("2024-01-10").value // 1000  # period a (µs epoch)
    t_b = pd.Timestamp("2024-01-20").value // 1000  # period b
    rows = []
    eid = 0
    for period_t in (t_a, t_b):
        for i, v in enumerate([5.0, 25.0, 45.0, 65.0, 85.0]):
            rows.append((eid := eid + 1, period_t + i, i, "view", v))
    sf = _write_events(tmp_path, rows)
    got, want = _both(spark, sf, "q150_psi_drift")
    pd.testing.assert_frame_equal(got, want)
    assert set(got["psi"]) == {"0.0"}
    assert (got["share_a"] == got["share_b"]).all()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
