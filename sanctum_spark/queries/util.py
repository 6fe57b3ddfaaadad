"""Cross-engine numeric helpers for oracle-checked queries."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Averages/divisions of 2-dp money values frequently land EXACTLY on a
# rounding half-boundary (e.g. 28.84625 at 4 dp), where double noise makes
# Spark and DuckDB round to different sides.  Nudging by +1e-9 on BOTH
# sides moves the boundary off the exact-half lattice so both engines
# always agree.  Plain SUM-of-2dp rounding at 2 dp is never on a boundary
# and needs no nudge.
EPS = 1e-9


def stable_round(col: Column, scale: int) -> Column:
    return F.round(col + F.lit(EPS), scale)


def sql_stable_round(expr: str, scale: int) -> str:
    return f"ROUND(({expr}) + 1e-9, {scale})"


# SUMs of price products (price * (1-disc) [* (1+tax)]) are decimal-exact
# at 4-6 dp, so their true values can sit EXACTLY on a 2-dp rounding
# boundary while cross-engine FP noise is ~1e-7 (too big for the 1e-9
# nudge).  5e-7 clears the noise yet stays below the 1e-6 data grid, so
# both engines always land on the same side.  Use for rounded money sums
# involving multiplication; plain sums of 2-dp values never sit on a
# boundary and need no nudge.
MONEY_EPS = 5e-7


def money_round(col: Column, scale: int = 2) -> Column:
    return F.round(col + F.lit(MONEY_EPS), scale)


def sql_money_round(expr: str, scale: int = 2) -> str:
    # `+ 0.0` normalizes IEEE signed zero: DuckDB's ROUND keeps the
    # input's sign on a -0.0 result where Spark's round (BigDecimal,
    # which has no negative zero) returns +0.0 — the r8 fuzz sweep
    # caught the two stringifying differently ('-0.0' vs '0.0').
    return f"(ROUND(({expr}) + 5e-7, {scale}) + 0.0)"


# ---------------------------------------------------------------------------
# Integer-grain pins (round 5).
#
# ROUND(x, s) pins return a DOUBLE, and different engine builds materialize
# "the same" s-dp decimal as different last-bit doubles (round is typically
# implemented as round(x * 10^s) / 10^s, and the divide-back step is where
# builds disagree) — the r4 driver gate showed exactly this on two queries
# that pass bit-exactly against local DuckDB 1.0.0.  Comparing at integer
# grain removes the representation entirely: FLOOR(x * 10^s + 0.5 + eps)
# cast to BIGINT is one correctly-rounded multiply + adds + an exact floor,
# so both engines agree unless the PRE-round value itself straddles the
# half-boundary within engine noise (~ulp) — the same residual risk the
# double pins had, minus the representation channel.  FLOOR(+0.5) instead
# of ROUND also sidesteps half-even vs half-away variance across builds.
#
# Pure-integer pins (no helper needed) pair DuckDB `//` with Spark `DIV`
# (q131 avg_chars_e2, q141 share_e6).  On INTEGER operands the pairing
# is exact for ALL signs: DuckDB's integer `//` truncates toward zero
# exactly like Spark's DIV (probed r6: (-100)//7 = -14 on both — an
# earlier note here claiming DuckDB floors was wrong).  The REAL trap
# is `//` on DOUBLE operands: DuckDB then performs PLAIN division
# ((-100.0)//7 = -14.2857…, no floor at all), so never pair a
# double-typed `//` with an integer DIV — cast to BIGINT first or use
# explicit FLOOR on both engines.
# Also: any oracle output column built from SUM(<integer col>) or `//`
# MUST be wrapped in CAST(... AS BIGINT) — DuckDB returns HUGEINT, which
# pandas materializes as float64 and the driver's stringified value hash
# sees as "600.0" != "600" (the r4/r5 q131/q141 gate failures).
#
# DOMAIN (r6 extreme-value sweep): a scale-s grain requires
# |x| * 10^s < 2^63 (~9.2e18) — beyond that DuckDB's BIGINT cast ERRORS
# while Spark overflows/errors separately (observed: q153's DTW-cost
# oracle on a 1e15-magnitude daily sum).  Likewise the ROUND(x+eps, n)
# double pins only stabilize representation for |x| small enough that
# one ulp < 10^-n; at |x| >= ~1e12 engine summation-order ulps exceed
# the decimal grain and the stringified doubles may differ in the last
# digit (observed: q89 var at 1e27, q100 avg at 1e11 — both engines
# correct, the PIN loses meaning).  Values at these magnitudes are out
# of the pins' domain; the queries themselves remain well-defined.
# ---------------------------------------------------------------------------


def int_grain(col: Column, scale: int) -> Column:
    """Fixed-point pin: BIGINT of col * 10^scale, round-half-up + eps."""
    return F.floor(
        col * F.lit(float(10**scale)) + F.lit(0.5) + F.lit(EPS)
    ).cast("long")


def sql_int_grain(expr: str, scale: int) -> str:
    return (
        f"CAST(FLOOR(({expr}) * {float(10 ** scale):.1f} + 0.5 + 1e-9)"
        " AS BIGINT)"
    )




def sql_json_int(col_sql: str, path_sql: str) -> str:
    """DuckDB SQL equivalent of Spark's
    ``get_json_object(col, path).try_cast("long")``.  Two accepted
    shapes, matching Spark's lenient extraction (probed on Spark 4.1.2,
    r7 — see tests/test_edge_invariants_b12.py):

    - INTEGER literals (json_type UBIGINT/BIGINT).  A bare TRY_CAST of
      the extracted string would diverge on DOUBLE literals: DuckDB
      rounds '3.7' to 4 where Spark's try_cast yields NULL (r6
      degenerate-row sweep).
    - STRING literals whose content is a Spark-castable integer:
      optional surrounding control/space chars (UTF8String.trimAll
      trims everything <= 0x20), optional sign, ASCII digits only — no
      decimal point, exponent, or Unicode digits.  On {"k":"5"} Spark
      extracts the unquoted '5' and casts to 5; the previous
      integer-literal-only CASE returned NULL there (r6 ADVICE item 2).
      The regexp_extract pulls exactly the sign+digits (no-match -> ''
      -> NULL), so DuckDB's own VARCHAR cast leniency (it would round
      '3.7' to 4) never applies.

    ``path_sql`` is raw SQL (e.g. "'$.k'" or "'$.' || k"); the outer
    TRY_CAST still guards int64 overflow on both shapes.
    """
    j = f"TRY_CAST({col_sql} AS JSON)"
    s = f"json_extract_string({j}, {path_sql})"
    int_re = r"'^[\x00-\x20]*([+-]?[0-9]+)[\x00-\x20]*$'"
    return (
        f"(CASE WHEN json_type({j}, {path_sql}) IN ('UBIGINT', 'BIGINT') "
        f"THEN TRY_CAST({s} AS BIGINT) "
        f"WHEN json_type({j}, {path_sql}) = 'VARCHAR' "
        f"THEN TRY_CAST(regexp_extract({s}, {int_re}, 1) AS BIGINT) "
        f"END)"
    )


def sql_codepoint_levenshtein(a_sql: str, b_sql: str) -> str:
    """DuckDB SQL for a CODE-POINT Levenshtein distance matching Spark's
    ``F.levenshtein`` on any input (closes the r6 verdict's task #8
    blind spot, where oracle pairing for q115/q161 was exact only for
    ASCII).

    DuckDB's ``levenshtein`` counts BYTES ('café' vs 'cafe' = 2); edit
    distance depends only on the EQUALITY STRUCTURE of the symbol
    sequences, so recoding each pair's code points injectively into
    single-byte ASCII (chr(1)..chr(127)) makes byte distance equal
    code-point distance.  Per pair: collect the distinct code points of
    a||b (``string_split(s, '')`` is code-point-wise in DuckDB),
    ``translate`` both strings through codepoint->alphabet, then
    byte-levenshtein.  The recode is injective because the char list is
    distinct and the alphabet characters are distinct.

    RESIDUAL DOMAIN: a pair with > 127 distinct code points falls back
    to raw byte levenshtein (translate with a shorter 'to' would DELETE
    characters — worse than the documented divergence).  Tokens and
    names are far below that bound; pinned in
    tests/test_edge_invariants_b14.py.  NULL inputs take the fallback
    branch and stay NULL on both engines.
    """
    chars = f"list_distinct(string_split({a_sql} || {b_sql}, ''))"
    alpha = (
        "array_to_string(list_transform(generate_series(1, 127), "
        "i -> chr(CAST(i AS INTEGER))), '')"
    )
    from_s = f"array_to_string({chars}, '')"
    to_s = f"substr({alpha}, 1, len({chars}))"
    return (
        f"(CASE WHEN len({chars}) <= 127 THEN "
        f"levenshtein(translate({a_sql}, {from_s}, {to_s}), "
        f"translate({b_sql}, {from_s}, {to_s})) "
        f"ELSE levenshtein({a_sql}, {b_sql}) END)"
    )
