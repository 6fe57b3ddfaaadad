"""Query registry backing ``__spark_entry__.py``.

Each registered query is a pair:
- a Spark callable ``(spark, sf_dir) -> DataFrame``
- an optional ANSI-SQL oracle string (DuckDB-runnable on the same parquet
  tables) — ``None`` for genuinely non-SQL-expressible operators, which the
  driver then checks rows-only.

Column-name discipline: the driver sorts columns by name and hash-compares
values, so every computed column is aliased identically in the Spark code
and the oracle SQL.  Float aggregates are rounded (2-6 dp) on BOTH sides so
summation-order differences between Spark partial aggregation and DuckDB
never flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def load_all_modules() -> None:
    """Import every query module so registration side effects run."""
    from sanctum_spark.queries import (  # noqa: F401
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        events_q,
        llm_q,
        spells_q,
        ops_q,
        coverage_q,
        pipeline_q,
        pipeline2_q,
        pipeline3_q,
    )


def queries() -> dict[str, QueryFn]:
    load_all_modules()
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_sql() -> dict[str, str]:
    load_all_modules()
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}
