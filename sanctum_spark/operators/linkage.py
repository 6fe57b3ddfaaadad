"""Entity resolution (record linkage): blocking → in-block fuzzy
candidate matching → transitive closure → entity canonicalization.

The Fellegi-Sunter pipeline shape with a deterministic match rule,
built Spark-first: blocking is an EQUI self-join on the block key (the
fuzzy predicate never sees the cross product), candidate verification
runs JVM-side (``levenshtein`` + a free length-delta prefilter), and
transitive closure reuses :func:`sanctum_spark.operators.dedup.
connected_components` — A~B and B~C must land in one entity.

Scale notes (100 TB): within-block work is quadratic in BLOCK size,
never corpus size, so the block key must keep per-block cardinality
bounded.  ``prefix_len`` adds a name-prefix secondary block for exactly
that: records whose fuzzy column agrees on the first ``prefix_len``
characters.  This is a RECALL TRADE (an edit inside the prefix crosses
blocks and the pair is missed) — the standard multi-pass answer is to
union candidate pairs from several cheap blocking passes.  Skewed
blocks beyond that: ``operators.joins.salted_join``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegralType

__all__ = ["blocked_candidate_pairs", "resolve_entities"]


def _require_integral_id(df: DataFrame, id_col: str, fn: str) -> None:
    """``connected_components`` casts ids to LONG; a non-numeric id would
    cast to null and silently make every record its own singleton entity.
    Fail loudly instead of resolving nothing."""
    dt = df.schema[id_col].dataType
    if not isinstance(dt, IntegralType):
        raise TypeError(
            f"{fn}: id_col {id_col!r} must be an integral type (its values "
            f"feed connected_components' LONG node ids); got {dt.simpleString()}. "
            "Hash or dense-rank string ids to longs first "
            "(e.g. xxhash64(id) or a dimension join)."
        )


def blocked_candidate_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    fuzzy_col: str,
    max_dist: int = 1,
    prefix_len: int = 0,
) -> DataFrame:
    """Candidate ``(id_a, id_b)`` pairs (``id_a < id_b``) whose block
    keys match exactly and whose ``fuzzy_col`` values are within
    Levenshtein distance ``max_dist``.

    The length-delta prefilter (``|len(a)-len(b)| <= max_dist``) is
    exact — an edit script of length d changes string length by at most
    d — and prunes most candidates before the O(len²) DP runs.

    ``id_col`` must be an integral type: downstream
    :func:`resolve_entities` feeds the pairs into
    ``connected_components``, whose node ids are LONGs.
    """
    _require_integral_id(df, id_col, "blocked_candidate_pairs")
    cols = [id_col, fuzzy_col, *block_cols]
    # Fixed-width block key distribution (r14, guide §2.5/§3.1): when
    # the record table is small enough to broadcast (q161's part catalog
    # at bench SF), the planner makes this a BroadcastHashJoin whose
    # STREAM side is the raw scan — a single-row-group input runs as ONE
    # task, and the quadratic in-block levenshtein (the expensive part,
    # ~1.3M candidate evaluations at sf0.1) serializes on one core.
    # repartition(P, block_cols) fans the stream side out to session
    # width; when the table outgrows broadcast the same node is
    # hash-compatible with the shuffle join's requirement, so it stays
    # ONE exchange per side (REPARTITION_BY_NUM) at the width
    # ENSURE_REQUIREMENTS would pick anyway.  Keyed by the block cols —
    # not round-robin — so in-block pairs stay co-located under either
    # strategy.  Paired A/B on the q161 pairs stage (6 pairs, one JVM):
    # median ratio 0.34 (1.0 s -> 0.32 s), output identical; plans:
    # plans/r14/q161_pairs_stage_{before,after}.txt.
    base = df.select(*cols).repartition(
        df.sparkSession.sparkContext.defaultParallelism, *block_cols
    )
    a, b = base.alias("a"), base.alias("b")
    on: list[Column] = [
        F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols
    ]
    if prefix_len > 0:
        on.append(
            F.substring(f"a.{fuzzy_col}", 1, prefix_len)
            == F.substring(f"b.{fuzzy_col}", 1, prefix_len)
        )
    on += [
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
        F.abs(F.length(f"a.{fuzzy_col}") - F.length(f"b.{fuzzy_col}"))
        <= max_dist,
        F.levenshtein(F.col(f"a.{fuzzy_col}"), F.col(f"b.{fuzzy_col}"))
        <= max_dist,
    ]
    return a.join(b, on=on).select(
        F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    fuzzy_col: str,
    max_dist: int = 1,
    prefix_len: int = 0,
) -> DataFrame:
    """Assign every record an ``entity_id`` (the minimum ``id_col`` in
    its transitive match closure; singletons map to themselves).

    Returns the input columns plus ``entity_id``.  ``id_col`` must be an
    integral type (see :func:`blocked_candidate_pairs`); a TypeError is
    raised otherwise rather than silently producing all-singleton output.
    """
    from sanctum_spark.operators.dedup import connected_components

    # id validation happens in blocked_candidate_pairs (first touch) and
    # again inside connected_components itself (shared-operator guard)
    pairs = blocked_candidate_pairs(
        df, id_col, block_cols, fuzzy_col, max_dist, prefix_len
    )
    comp = connected_components(pairs, "id_a", "id_b").select(
        F.col("id").alias(id_col), F.col("component")
    )
    return (
        df.join(comp, id_col, "left")
        .withColumn("entity_id", F.coalesce(F.col("component"), F.col(id_col)))
        .drop("component")
    )
