"""Bucketed-table checkpointing for iterative operators.

``localCheckpoint`` cuts lineage but stores blocks on executors — on a
real cluster the per-round state of an iterative operator (labels, ranks)
is better written to a BUCKETED table keyed on the join key: the write
clusters the data once, and every subsequent round's join against it is
a zero-Exchange sort-merge join (bucketed scan on both sides), so one
partitioning is paid once and reused for the whole iteration.  This is
the pattern the graph/dedup docstrings promise; plan shape pinned in
tests/test_plans.py::test_bucketed_checkpoint_join_no_label_exchange.

Local note: saveAsTable writes through the session catalog
(spark-warehouse dir locally; the metastore-backed table on a cluster).
Callers pass a table-name PREFIX; per-round state ping-pongs between two
tables so a round never overwrites the table it is reading.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def bucketed_checkpoint(
    df: DataFrame, table: str, key: str, n_buckets: int
) -> DataFrame:
    """Materialize ``df`` as a bucketed table keyed on ``key`` and return
    a DataFrame reading from it.  Replaces the table if it exists."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )
    return spark.table(table)


class PingPongCheckpoint:
    """Rotating set of bucketed tables for per-round iterative state: a
    round must never overwrite a table it (or a sibling intermediate in
    the same round) is still reading, so writes cycle over THREE tables —
    enough for one carried state plus one intra-round intermediate (the
    pointer-jumping path writes two checkpoints per round)."""

    def __init__(self, prefix: str, key: str, n_buckets: int):
        self.tables = [f"{prefix}_a", f"{prefix}_b", f"{prefix}_c"]
        self.key = key
        self.n_buckets = n_buckets
        self._i = 0

    def write(self, df: DataFrame) -> DataFrame:
        table = self.tables[self._i % 3]
        self._i += 1
        return bucketed_checkpoint(df, table, self.key, self.n_buckets)
