"""LLM-training-data pipeline queries over ``documents`` / ``embeddings``.

North-star operators (BASELINE.json): deduplication, similarity search,
text analysis.  The oracle-checkable subset lives here; the heavier
non-SQL-expressible variants (MinHash-LSH, SimHash, ANN buckets) live in
``sanctum_spark.operators`` and are registered rows-only in round 2+.

Scale notes: exact dedup is a hash-groupBy (one shuffle on the digest —
at 100 TB, digest-partitioned and AQE-coalesced); brute-force cosine top-k
broadcasts the single query vector and reduces with TakeOrdered, never
materializing the full similarity matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sanctum_spark.io import load_table
from sanctum_spark.queries import register
from sanctum_spark.queries.util import stable_round


@register(
    "q70_exact_dedup",
    """
    SELECT md5(text)        AS digest,
           COUNT(*)         AS n_copies,
           MIN(doc_id)      AS keeper_doc_id
    FROM documents
    GROUP BY 1
    """,
    doc="exact dedup: content digest → group → keep lowest doc_id.",
)
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("digest", F.md5(F.col("text")))
        .groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


@register(
    "q71_text_stats",
    """
    SELECT doc_id,
           LENGTH(text)                                   AS n_chars_actual,
           CAST(len(str_split(text, ' ')) AS BIGINT)      AS n_tokens,
           CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT) AS n_unique_tokens,
           ROUND(LENGTH(REPLACE(text, ' ', '')) * 1.0
                 / len(str_split(text, ' ')) + 1e-9, 4)   AS avg_token_len
    FROM documents
    """,
    doc="per-document token counting + lexical stats (JVM-side, no UDF).",
)
def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_actual"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        stable_round(
            F.length(F.regexp_replace("text", " ", "")) * F.lit(1.0) / F.size(toks), 4
        ).alias("avg_token_len"),
    )


@register(
    "q72_lang_quality",
    """
    SELECT lang, source,
           COUNT(*)                                            AS n_docs,
           ROUND(AVG(LENGTH(text)) + 1e-9, 4)                  AS avg_chars,
           ROUND(AVG(len(str_split(text, ' '))) + 1e-9, 4)     AS avg_tokens,
           CAST(SUM(CASE WHEN LENGTH(text) >= 200 THEN 1 ELSE 0 END) AS BIGINT)
                                                               AS n_quality
    FROM documents
    GROUP BY lang, source
    """,
    doc="corpus quality profile by language and source.",
)
def q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            stable_round(F.avg(F.length("text")), 4).alias("avg_chars"),
            stable_round(F.avg(F.size(toks)), 4).alias("avg_tokens"),
            F.sum(F.when(F.length("text") >= 200, 1).otherwise(0))
            .cast("long")
            .alias("n_quality"),
        )
    )


@register(
    "q73_cosine_topk",
    """
    WITH q AS (
        SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0
    )
    SELECT vec_id, label,
           -- dim guard: list_dot_product ERRORS on unequal lengths,
           -- while Spark's zip_with pads with NULL and the dot folds to
           -- NULL — degenerate vectors get NULL cos_sim on both engines
           -- and rank last (r6 embeddings sweep)
           CASE WHEN embedding IS NOT NULL AND len(embedding) = len(qvec)
                THEN ROUND(
                    list_dot_product(CAST(embedding AS DOUBLE[]), qvec)
                    / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[])))
                       * sqrt(list_dot_product(qvec, qvec))),
                    5) END AS cos_sim
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """,
    doc=(
        "brute-force cosine top-k against one query vector: broadcast the "
        "query, JVM-side zip_with/aggregate dot products, TakeOrdered top-k."
    ),
)
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = (
        emb.filter(F.col("vec_id") == 0)
        .select(F.transform("embedding", lambda x: x.cast("double")).alias("qvec"))
    )
    cand = emb.filter(F.col("vec_id") != 0).select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    joined = cand.crossJoin(F.broadcast(qvec))
    # try_divide: a zero-norm embedding yields NULL cosine (ranked last
    # by DESC on both engines) instead of the ANSI DIVIDE_BY_ZERO a raw
    # `/` throws — DuckDB double division by zero is NULL, so raw `/`
    # here is a crash on Spark AND a divergence in the oracle pairing
    # (pinned in tests/test_edge_invariants_b8.py).
    sim = F.try_divide(
        dot(F.col("vec"), F.col("qvec")),
        F.sqrt(dot(F.col("vec"), F.col("vec")))
        * F.sqrt(dot(F.col("qvec"), F.col("qvec"))),
    )
    return (
        joined.select("vec_id", "label", F.round(sim, 5).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )
