"""Join helpers beyond plain equi-joins: as-of and range joins.

Both are expressed as compositions of built-in DataFrame ops so Catalyst
keeps optimizing around them (pushdown, AQE).  For genuinely huge
many-to-many time joins, `asof_join` also offers a merge_asof strategy
over ``applyInPandas`` co-grouping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    suffix: str = "_r",
    tolerance: Column | None = None,
    strategy: str = "rank",
) -> DataFrame:
    """For each left row, attach the single right row with the greatest
    ``right_time`` ≤ ``left_time`` (direction='backward'; 'forward' takes
    the least ≥), matching on equi-key(s).

    Two strategies, identical semantics:

    - ``rank``: key-equi join + time inequality, then a ranking window
      keyed by the left row identity.  Intermediate size = every
      (left row × matching-band right row) pair — fine with a
      ``tolerance`` band, quadratic-ish without one.
    - ``merge``: union both sides into one per-key stream sorted by time
      and carry the latest right payload forward with
      ``last(ignorenulls)`` — the merge-scan as-of.  ZERO fan-out: one
      shuffle on the key, one sort, intermediate size = |left| + |right|.
      The strategy to use when right-side history per key is unbounded
      (the 100 TB shape).  Requires ``left_time``/``right_time`` to be
      comparable types (cast date → timestamp at the call site).

    ``tolerance`` (a Column interval/long) bounds the band in both
    strategies.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if strategy == "merge":
        return _asof_merge(
            left, right, keys, left_time, right_time, direction, suffix, tolerance
        )
    if strategy != "rank":
        raise ValueError(f"strategy must be rank|merge, got {strategy!r}")

    # tag each left row with a stable identity for the ranking window
    tagged = left.withColumn("_asof_rid", F.monotonically_increasing_id())
    # rename right keys (and any clashing columns) so nothing is ambiguous
    renamed = right
    for k in keys:
        renamed = renamed.withColumnRenamed(k, f"_rk_{k}")
    rtime = right_time if right_time not in keys else f"_rk_{right_time}"
    for c in renamed.columns:
        if c in left.columns:
            renamed = renamed.withColumnRenamed(c, c + suffix)
            if c == rtime:
                rtime = c + suffix

    lt, rt = F.col(left_time), F.col(rtime)
    if direction == "backward":
        cond = rt <= lt
        order = [rt.desc_nulls_last()]
    elif direction == "forward":
        cond = rt >= lt
        order = [rt.asc_nulls_last()]
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if tolerance is not None:
        cond = cond & (rt >= lt - tolerance if direction == "backward" else rt <= lt + tolerance)

    join_cond = cond
    for k in keys:
        join_cond = (F.col(k) == F.col(f"_rk_{k}")) & join_cond
    joined = tagged.join(renamed, join_cond, "left")
    # deterministic tiebreak: remaining right columns, descending
    tiebreak = [
        F.col(c).desc_nulls_last()
        for c in renamed.columns
        if c != rtime and not c.startswith("_rk_")
    ]
    w = W.partitionBy("_asof_rid").orderBy(*order, *tiebreak)
    return (
        joined.withColumn("_asof_rn", F.row_number().over(w))
        .filter(F.col("_asof_rn") == 1)
        .drop("_asof_rn", "_asof_rid", *[f"_rk_{k}" for k in keys])
    )


def _asof_merge(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_time: str,
    right_time: str,
    direction: str,
    suffix: str,
    tolerance: Column | None,
) -> DataFrame:
    """Merge-scan as-of: interleave both sides per key, ordered by time
    with right rows first at equal times (inclusive bound), and carry the
    latest right payload struct forward with last(ignorenulls).

    Tie-break matches the rank strategy: the payload struct leads with
    right_time then the remaining right columns in order, so the max
    struct is the (right_time DESC, cols DESC) rank-1 row.
    """
    reserved = {"_t", "_kind", "_rpay", "_last"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"asof_join(strategy='merge') reserves internal column names "
            f"{sorted(reserved)}; rename input column(s) {sorted(clash)}"
        )
    # rename right payload columns that clash with left column names
    renamed = right
    rtime = right_time
    for c in right.columns:
        if c in keys:
            continue
        if c in left.columns:
            renamed = renamed.withColumnRenamed(c, c + suffix)
            if c == rtime:
                rtime = c + suffix
    payload_cols = [c for c in renamed.columns if c not in keys]
    ordered_payload = [rtime] + [c for c in payload_cols if c != rtime]

    rpart = renamed.select(
        *[F.col(k) for k in keys],
        F.col(rtime).alias("_t"),
        F.lit(0).alias("_kind"),
        F.struct(*[F.col(c) for c in ordered_payload]).alias("_rpay"),
    )
    lpart = left.withColumn("_t", F.col(left_time)).withColumn("_kind", F.lit(1))
    u = lpart.unionByName(rpart, allowMissingColumns=True)

    if direction == "backward":
        t_order = F.col("_t").asc_nulls_last()
    elif direction == "forward":
        t_order = F.col("_t").desc_nulls_last()
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    w = (
        W.partitionBy(*keys)
        .orderBy(t_order, F.col("_kind").asc(), F.col("_rpay").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = u.withColumn("_last", F.last("_rpay", ignorenulls=True).over(w)).filter(
        F.col("_kind") == 1
    )

    # A null left_time never matches in the rank strategy (NULL comparison)
    # — blank the carried payload to keep strategies identical.
    valid = F.col(left_time).isNotNull() & F.col("_last").isNotNull()
    if tolerance is not None:
        lt, got_rt = F.col(left_time), F.col("_last")[rtime]
        valid = valid & (
            got_rt >= lt - tolerance
            if direction == "backward"
            else got_rt <= lt + tolerance
        )
    out = out.withColumn("_last", F.when(valid, F.col("_last")))
    for c in ordered_payload:
        out = out.withColumn(c, F.col("_last")[c])
    return out.drop("_t", "_kind", "_rpay", "_last")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: explode the (small-ish) right side into
    ``n_salts`` copies and scatter the left side's hot keys uniformly over
    them, so one pathological key spreads across n_salts tasks instead of
    stalling the stage on a single straggler.

    AQE's skew-join split handles most cases automatically; salting is the
    explicit fallback when a single key exceeds what one task can hold
    (e.g. 10% of 100 TB on one join key).  Result is identical to a plain
    equi-join on ``on`` for ``how`` in {'inner', 'left'}; right/full outer
    modes are rejected — the exploded right side would emit each unmatched
    right row once per salt.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the right side is exploded n_salts times, so outer-right "
            "modes would duplicate unmatched right rows"
        )
    salt = F.floor(F.rand(seed=42) * n_salts).cast("int")
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = l_salted.join(r_salted, [on, "_salt"], how)
    return out.drop("_salt")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] | None,
    left_time: str,
    right_lo: str,
    right_hi: str,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: left.time ∈ [right.lo, right.hi), with
    optional equi-key(s) (which make it a shuffled equi-join + residual
    band predicate — the plan to want at scale; a pure range join without
    keys becomes a broadcast-nested-loop and only suits small right sides).
    """
    cond = (F.col(left_time) >= F.col(right_lo)) & (F.col(left_time) < F.col(right_hi))
    if on:
        keys = [on] if isinstance(on, str) else list(on)
        for k in keys:
            cond = (left[k] == right[k]) & cond
    return left.join(right, cond, how)


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Keyless point-in-interval join as a bounded EQUI-join.

    A keyless range join has no equi-condition, so Catalyst can only run
    it as a broadcast-nested-loop (small right side) or a cartesian
    product — both non-starters when the interval table is large. The
    classic fix: quantize the domain into bins of ``bin_width``. Each
    left row lands in exactly ONE bin (floor(point/w)); each interval
    [lo, hi) explodes into the bins it covers. Joining on the bin key is
    a plain shuffled/broadcast HASH join; the band predicate remains as a
    residual filter. Because the left side carries a single bin, every
    true (left, interval) pair meets exactly once — no dedup needed.

    Cost: the interval side is replicated ceil(span/bin_width) times, so
    pick ``bin_width`` near the MEDIAN interval span (replication ~2x).
    At 100 TB both sides shuffle on the bin key (or the binned interval
    table broadcasts if small) and AQE handles hot bins; skewed giant
    intervals can additionally be split by salting their bin ranges.

    All three columns must be integral (cast timestamps to epoch units
    at the call site — keeps the operator domain-agnostic).
    """
    w = int(bin_width)
    if w <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    # Empty / inverted intervals (hi <= lo) can match nothing, but without
    # this guard sequence(lo_bin, hi_bin) runs DESCENDING and still
    # explodes |span|/bin_width bin rows per bad interval — a silent
    # blow-up on dirty data.  Dropping them up front keeps the explode
    # proportional to real coverage (note: they are dropped even under
    # outer joins — a zero-width interval has no point-in-interval match
    # by definition).
    right = right.filter(F.col(right_hi) > F.col(right_lo))
    lbin = (F.col(left_point) - (((F.col(left_point) % w) + w) % w)) / w
    lo, hi = F.col(right_lo), F.col(right_hi)
    lo_bin = (lo - (((lo % w) + w) % w)) / w
    hi1 = hi - 1  # hi is exclusive
    hi_bin = (hi1 - (((hi1 % w) + w) % w)) / w
    exploded = right.withColumn(
        "_bin", F.explode(F.sequence(lo_bin.cast("long"), hi_bin.cast("long")))
    )
    tagged = left.withColumn("_bin", lbin.cast("long"))
    cond = (
        (tagged["_bin"] == exploded["_bin"])
        & (F.col(left_point) >= lo)
        & (F.col(left_point) < hi)
    )
    return tagged.join(exploded, cond, how).drop("_bin")
