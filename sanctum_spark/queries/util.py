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
