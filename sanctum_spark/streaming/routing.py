"""Topic-routed stream demux: one event stream, N spell subscriptions
(reference roadmap README.md:92-94 — topic- and predicate-based
subscriptions).

Each subscription is a (spell, predicate) branch; ``demux_foreach_batch``
fans a single stream out to every branch inside one foreachBatch pass so
the source is read once per micro-batch regardless of branch count.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sanctum_spark.spells.registry import Spell, topic_filter


def subscription_filter(spell: Spell, predicate: str | None = None, topic_col: str = "event_type"):
    """Routing predicate for one spell: null-tolerant topic match (O4
    semantics) AND an optional SQL predicate subscription."""
    cond = topic_filter(spell, topic_col)
    if predicate is not None:
        cond = cond & F.expr(predicate)
    return cond


def demux_foreach_batch(
    subscriptions: list[tuple[Spell, str | None, Callable[[str, DataFrame, int], None]]],
    topic_col: str = "event_type",
):
    """Build a foreachBatch function fanning each micro-batch to every
    subscription's sink callable ``(spell_name, routed_df, batch_id)``.

    The micro-batch DataFrame is persisted once so N branch filters don't
    re-read the source N times."""

    def run(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            for spell, predicate, sink in subscriptions:
                routed = batch_df.filter(subscription_filter(spell, predicate, topic_col))
                sink(spell.name, routed, batch_id)
        finally:
            batch_df.unpersist()

    return run
