"""Data-layout operators: multi-dimensional clustering for scan pruning.

At 100 TB the cheapest query is the one that never reads the file:
parquet footers carry per-file/per-row-group min/max for every column,
and Spark's scan skips files whose range can't match the predicate.
One sort column prunes one dimension; a Z-order (Morton) curve
interleaves the bits of several ranked dimensions so that files stay
simultaneously tight in ALL of them — the standard layout trick for
multi-tenant scan-heavy tables (Delta OPTIMIZE ZORDER, Hudi clustering).

Everything here is expression-level (shiftleft/bitwiseAND inside the
scan projection) plus one range repartition — no UDF, no extra shuffle
beyond the write's own ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column], bits: int = 16) -> Column:
    """Morton code: interleave the low ``bits`` bits of each column.

    ``cols`` must already be non-negative integers scaled to [0, 2^bits)
    — rank/normalize first (see ``zorder_by``).  Bit i of column j lands
    at output bit ``i * len(cols) + j``, so all columns share the
    high-order bits of the curve and a range of z-values is a small
    hyper-rectangle in every dimension.
    """
    n = len(cols)
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
            out = out + F.shiftleft(bit, i * n + j)
    return out


def zorder_by(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    n_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` on the Z-order curve of ``cols``.

    Each column is first rank-normalized into [0, 2^bits) with a global
    ``percent_rank`` (ranking costs one sort per column at table grain —
    at production scale substitute approx quantile bounds from table
    stats, which needs no shuffle at all), then rows are range-
    partitioned and sorted by the interleaved z-value.  Writing the
    result gives parquet files whose min/max footprints are tight in
    every clustered column, so predicates on ANY of them prune files.
    """
    from pyspark.sql.window import Window

    scaled = []
    tmp = df
    for i, name in enumerate(cols):
        r = F.percent_rank().over(Window.orderBy(F.col(name)))
        tmp = tmp.withColumn(
            f"_z{i}", F.least(F.floor(r * (1 << bits)), F.lit((1 << bits) - 1))
        )
    z = zvalue([F.col(f"_z{i}") for i in range(len(cols))], bits)
    tmp = tmp.withColumn("_zval", z).drop(*[f"_z{i}" for i in range(len(cols))])
    if n_partitions:
        tmp = tmp.repartitionByRange(n_partitions, "_zval")
    else:
        tmp = tmp.repartitionByRange("_zval")
    return tmp.sortWithinPartitions("_zval").drop("_zval")
