"""Top-k helpers.

Global top-k through ``orderBy().limit()`` compiles to
TakeOrderedAndProject (per-partition heaps + driver merge — no full sort,
no shuffle of the losers), which is exactly the plan wanted at 100 TB.
Per-group top-k is a ranking window: one shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def global_topk(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    return df.orderBy(*order_by).limit(k)


def grouped_topk(
    df: DataFrame, group_cols: list[str], order_by: list[Column], k: int
) -> DataFrame:
    w = W.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
    )
