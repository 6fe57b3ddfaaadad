"""Property-style hardening for the join helpers: asof_join checked
against a brute-force per-row reference on randomized (seeded) data, and
the distributed feedback loop's 1000-cast bound."""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from sanctum_spark.operators import joins as J
from sanctum_spark.spells import Spell, loop_spell


import pytest


@pytest.mark.parametrize("strategy", ["rank", "merge"])
def test_asof_join_matches_bruteforce_random(spark, strategy):
    rng = random.Random(7)
    left = [
        (i, rng.randint(0, 5), rng.randint(0, 1000)) for i in range(300)
    ]  # (lid, key, t)
    right = [
        (j, rng.randint(0, 5), rng.randint(0, 1000), rng.randint(0, 99))
        for j in range(200)
    ]  # (rid, key, rt, payload)
    ldf = spark.createDataFrame(left, "lid long, key long, t long")
    rdf = spark.createDataFrame(right, "rid long, key long, rt long, payload long")

    got = {
        r["lid"]: r["rid"]
        for r in J.asof_join(
            ldf, rdf, on="key", left_time="t", right_time="rt", strategy=strategy
        ).collect()
    }

    # brute force: greatest rt <= t per key; ties broken by the largest
    # remaining right column (rid DESC, matching the operator's tiebreak)
    for lid, key, t in left:
        cands = [(rt, rid) for (rid, k, rt, _) in right if k == key and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, (lid, key, t, cands)


@pytest.mark.parametrize("strategy", ["rank", "merge"])
def test_asof_forward_and_tolerance_both_strategies(spark, strategy):
    ldf = spark.createDataFrame([(1, 1, 100), (2, 1, 40)], "lid long, key long, t long")
    rdf = spark.createDataFrame(
        [(10, 1, 50), (11, 1, 150), (12, 1, 120)], "rid long, key long, rt long"
    )
    fwd = {
        r["lid"]: r["rid"]
        for r in J.asof_join(
            ldf, rdf, on="key", left_time="t", right_time="rt",
            direction="forward", strategy=strategy,
        ).collect()
    }
    assert fwd == {1: 12, 2: 10}  # least rt >= t
    tol = {
        r["lid"]: r["rid"]
        for r in J.asof_join(
            ldf, rdf, on="key", left_time="t", right_time="rt",
            tolerance=F.lit(30), strategy=strategy,
        ).collect()
    }
    assert tol == {1: None, 2: None}  # 50 < 100-30; nothing <= 40


def test_asof_forward_direction(spark):
    ldf = spark.createDataFrame([(1, 1, 100)], "lid long, key long, t long")
    rdf = spark.createDataFrame(
        [(10, 1, 50), (11, 1, 150), (12, 1, 120)], "rid long, key long, rt long"
    )
    fwd = J.asof_join(ldf, rdf, on="key", left_time="t", right_time="rt", direction="forward")
    assert fwd.first()["rid"] == 12  # least rt >= t


def test_asof_tolerance_bounds_band(spark):
    ldf = spark.createDataFrame([(1, 1, 100)], "lid long, key long, t long")
    rdf = spark.createDataFrame([(10, 1, 10)], "rid long, key long, rt long")
    out = J.asof_join(
        ldf, rdf, on="key", left_time="t", right_time="rt", tolerance=F.lit(50)
    )
    assert out.first()["rid"] is None  # 10 < 100-50 → outside tolerance


def test_distributed_loop_bound(spark):
    """FIXTURES.md: counter=2000 stops after exactly 1000 casts on the
    DISTRIBUTED path too (simulate-path bound already covered)."""
    df = spark.createDataFrame([(1, 2000), (2, 3)], "event_id long, counter long")

    def make_cast():
        def cast(event):
            if event["counter"] <= 1:
                return None
            e = dict(event)
            e["counter"] -= 1
            return e

        return cast

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("counter", T.LongType()),
            T.StructField("n_casts", T.LongType()),
        ]
    )
    out = {r["event_id"]: r for r in loop_spell(df, Spell(name="d", cast=make_cast()), schema).collect()}
    assert out[1]["n_casts"] == 1000
    assert out[1]["counter"] == 1000  # 2000 - 1000 decrements
    assert out[2]["n_casts"] == 3
    assert out[2]["counter"] == 1


def test_binned_range_join_drops_inverted_intervals(spark):
    """hi <= lo intervals can match nothing — and must not explode into
    |span|/bin_width descending-sequence bin rows either (the silent
    blow-up on dirty interval data)."""
    pts = spark.createDataFrame([(1, 5), (2, 500)], "pid long, p long")
    ivs = spark.createDataFrame(
        [
            (10, 0, 10),          # valid: contains p=5
            (11, 10_000, -10_000),  # inverted: 20k-wide descending span
            (12, 7, 7),           # empty
        ],
        "rid long, lo long, hi long",
    )
    out = J.binned_range_join(pts, ivs, "p", "lo", "hi", bin_width=10)
    rows = [(r["pid"], r["rid"]) for r in out.collect()]
    assert rows == [(1, 10)]


def test_zvalue_rejects_sign_bit_overflow(spark):
    """len(cols)*bits > 63 would push interleaved bits into the long
    sign bit and silently corrupt curve ordering — must raise."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from sanctum_spark.operators.layout import zvalue

    with _pytest.raises(ValueError, match="63"):
        zvalue([F.col("a"), F.col("b"), F.col("c"), F.col("d")], bits=16)
    # 4 cols at 15 bits fits
    zvalue([F.col("a"), F.col("b"), F.col("c"), F.col("d")], bits=15)
