"""Coverage closers for SURVEY.md §2.3: full-outer join, embedding
near-duplicate pairs, grouped-aggregate pandas UDF (UDAF), and a
row-generating spell (UDTF, 1→N fan-out).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sanctum_spark.io import load_table
from sanctum_spark.queries import register
from sanctum_spark.queries.util import stable_round


@register(
    "q44_full_outer",
    """
    SELECT COALESCE(a.k, b.k)         AS nationkey,
           COALESCE(a.n_cust, 0)      AS n_cust,
           COALESCE(b.n_supp, 0)      AS n_supp
    FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) a
    FULL OUTER JOIN
         (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1) b
      ON a.k = b.k
    """,
    doc="full-outer join of two aggregates with coalesced keys.",
)
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("ks"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    j = cust.join(supp, cust.k == supp.ks, "full_outer")
    return j.select(
        F.coalesce(F.col("k"), F.col("ks")).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


@register(
    "q79_embedding_neardup",
    None,
    doc=(
        "embedding-cosine near-duplicate pairs (cos >= 0.3) via LSH-"
        "bucketed self pair generation — the vector-space dedup operator. "
        "Rows-only; completeness vs the brute-force pair join asserted in "
        "tests/test_operators.py."
    ),
)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctum_spark.operators.similarity import embedding_near_duplicates

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_duplicates(emb, threshold=0.3).orderBy("id_a", "id_b")


@register(
    "q83_grouped_agg_udf",
    """
    SELECT user_id,
           ROUND(SUM(value * value) / SUM(value) + 1e-9, 4) AS self_weighted
    FROM events
    GROUP BY user_id
    """,
    doc=(
        "grouped-aggregate pandas UDF (UDAF): Arrow-batched numpy "
        "reduction per group, oracle-checked against its closed form."
    ),
)
def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    @F.pandas_udf("double")
    def self_weighted(v: pd.Series) -> float:
        # value-weighted mean of value: sum(v^2)/sum(v)
        return float((v * v).sum() / v.sum())

    return ev.groupBy("user_id").agg(
        stable_round(self_weighted("value"), 4).alias("self_weighted")
    )


@register(
    "q84_spell_fanout_udtf",
    """
    SELECT e.event_id, CAST(s.i AS BIGINT) AS copy_idx,
           ROUND(e.value / e.n, 2) AS share
    FROM (
        SELECT event_id, value,
               CAST(json_extract_string(props, '$.k') AS BIGINT) % 3 + 1 AS n
        FROM events
    ) e
    JOIN (SELECT UNNEST([1, 2, 3]) AS i) s ON s.i <= e.n
    """,
    doc=(
        "row-generating spell (UDTF, 1→N): each event fans out into "
        "k%3+1 equal shares — the reference's N:M roadmap (README.md:131) "
        "as a mapInPandas generator."
    ),
)
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "value",
        (F.get_json_object("props", "$.k").cast("long") % 3 + 1).alias("n_copies"),
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("copy_idx", T.LongType()),
            T.StructField("share", T.DoubleType()),
        ]
    )

    def fanout(batches):
        import math

        def round_half_away(x: float, nd: int = 2) -> float:
            # Python's round() is banker's (half-even); SQL ROUND is
            # half-away.  value/2 lands on exact dyadic halves (e.g.
            # 53.25/2 = 26.625) where the two disagree.
            scale = 10**nd
            return math.floor(x * scale + 0.5) / scale if x >= 0 else math.ceil(x * scale - 0.5) / scale

        for pdf in batches:
            out = {"event_id": [], "copy_idx": [], "share": []}
            for row in pdf.to_dict("records"):
                n = int(row["n_copies"])
                share = round_half_away(row["value"] / n, 2)
                for i in range(1, n + 1):
                    out["event_id"].append(row["event_id"])
                    out["copy_idx"].append(i)
                    out["share"].append(share)
            yield pd.DataFrame(out)

    return ev.mapInPandas(fanout, schema=schema)
