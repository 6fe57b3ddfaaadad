"""Lexical retrieval: Okapi BM25 scoring over a document corpus.

The data-selection scorer (Robertson/Spärck Jones) training pipelines
use to pull topic-relevant subsets out of a web corpus.  Spark-first
shape: the corpus is tokenized once and cut to the query terms BEFORE
any shuffle, so the per-(doc, term) aggregate ships |terms| ×
matching-docs rows, never the corpus vocabulary; idf and corpus stats
(N, avgdl) are tiny broadcast aggregates; the top-k is a
TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bm25_scores", "bm25_scoring", "bm25_topk"]


def _tokens(text_col: str):
    return F.split(F.trim(F.lower(text_col)), r"\s+")


def bm25_scores(
    docs: DataFrame,
    terms: list[str] | tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int | None = 6,
) -> DataFrame:
    """Per-document BM25 score for ``terms`` — ``(id_col, bm25)`` rows
    for every document matching at least one term.

    The returned frame holds a persisted intermediate that lives until
    the session ends (or ``spark.catalog.clearCache()``); callers that
    want deterministic release should use :func:`bm25_scoring` (context-
    manager form, unpersists on exit) or :func:`bm25_topk` (checkpoints
    its k rows and unpersists).  Scores are rounded to ``round_to``
    decimals (engine-stable ranking across IEEE-noise differences); pass
    ``None`` to keep raw doubles.
    """
    df_scored, tf = _bm25_build(docs, terms, text_col, id_col, k1, b, round_to)
    return df_scored


@contextmanager
def bm25_scoring(
    docs: DataFrame,
    terms: list[str] | tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int | None = 6,
) -> Iterator[DataFrame]:
    """Context-managed :func:`bm25_scores`: yields the scored frame and
    unpersists the shared tf intermediate on exit, so long-lived sessions
    don't accumulate executor cache.  Materialize (collect/write) inside
    the ``with`` block."""
    scored, tf = _bm25_build(docs, terms, text_col, id_col, k1, b, round_to)
    try:
        yield scored
    finally:
        # blocking: the point of the CM is deterministic release — a
        # fire-and-forget unpersist can outlive the block it guards
        tf.unpersist(blocking=True)


def bm25_topk(
    docs: DataFrame,
    terms: list[str] | tuple[str, ...],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int | None = 6,
) -> DataFrame:
    """Top-``k`` documents by BM25, ties broken by ``id_col`` so the cut
    line is reproducible across engines/runs/cluster layouts."""
    scored, tf = _bm25_build(docs, terms, text_col, id_col, k1, b, round_to)
    out = (
        scored.orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
        .localCheckpoint(eager=True)  # k rows; lets tf release below
    )
    tf.unpersist()
    return out


def _bm25_build(
    docs: DataFrame,
    terms,
    text_col: str,
    id_col: str,
    k1: float,
    b: float,
    round_to: int | None,
):
    """Shared pipeline; returns (scored, persisted_tf).  The tf table is
    persisted so the df/idf branch and the scoring branch share ONE
    evaluation — the lazy two-branch form re-scans the corpus."""
    toks = _tokens(text_col)
    base = docs.select(
        id_col, F.size(toks).alias("dl"), F.explode(toks).alias("term")
    ).filter(F.col("term").isin(*terms))
    stats = docs.select(F.size(toks).alias("dl")).agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )
    # (n, avgdl) ride along on the tf rows via ONE broadcast join, so
    # neither downstream branch re-evaluates the stats aggregate.
    tf = (
        base.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
        .join(F.broadcast(stats))
        .persist()
    )
    # per-term df: tf is (doc, term)-unique, so a plain count.
    idf = tf.groupBy("term").agg(
        F.log(
            (F.first("n") - F.count(F.lit(1)) + 0.5)
            / (F.count(F.lit(1)) + 0.5)
            + 1.0
        ).alias("idf")
    )
    lk1, lb = F.lit(float(k1)), F.lit(float(b))
    score = F.sum(
        F.col("idf")
        * F.col("tf")
        * (lk1 + 1.0)
        / (
            F.col("tf")
            + lk1 * (F.lit(1.0) - lb + lb * F.col("dl") / F.col("avgdl"))
        )
    )
    if round_to is not None:
        score = F.round(score + F.lit(1e-9), round_to)
    scored = (
        tf.join(F.broadcast(idf), "term")
        .groupBy(id_col)
        .agg(score.alias("bm25"))
    )
    return scored, tf
