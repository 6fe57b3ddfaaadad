"""Iterative graph operators over edge-list DataFrames.

Complements ``operators.dedup.connected_components`` (min-label
propagation) with rank-style iteration: PageRank / TextRank power
iteration expressed as per-round DataFrame joins.

Scale design (100 TB): every round is ONE shuffle of (node, rank)
pairs keyed on the node id — edges and strengths are materialized once
(``localCheckpoint``) and reused; the document/term payload never moves.
On a cluster, checkpoint edges to a bucketed table keyed on ``src`` so
every round's join reuses the same partitioning with no re-shuffle of
the edge side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    n_iter: int = 10,
    symmetric: bool = True,
    checkpoint_every: int = 3,
    checkpoint_table: str | None = None,
    n_buckets: int = 8,
) -> DataFrame:
    """Fixed-iteration (weighted) PageRank over an edge list ->
    ``(node, rank)``.

    A FIXED iteration count (not a convergence epsilon) keeps the result
    deterministic and cross-engine comparable: the same power-iteration
    steps produce the same ranks regardless of summation order (float
    noise stays ~1e-16 relative, absorbed by output rounding).

    With ``weight_col`` this is TextRank's formulation (Mihalcea &
    Tarau 2004): a node distributes its rank to neighbors proportionally
    to edge weight / its total outgoing strength. Without it, weights
    are 1 and strength degenerates to out-degree (classic PageRank).

    ``symmetric=True`` mirrors each edge (undirected graphs — TextRank's
    co-occurrence graph); after mirroring every node has strength > 0,
    so there is no dangling-mass term to redistribute.

    Per round: contributions = ranks joined to the (edge, strength)
    table on the source key, one groupBy(dst) sum — a single
    (node, rank)-sized shuffle; then the damped update left-joined onto
    the node set (nodes with no in-neighbors keep the teleport term).
    ``localCheckpoint`` every ``checkpoint_every`` rounds cuts lineage so
    the plan stays O(checkpoint_every) deep; eager per-round checkpoints
    were measured to serialize one job per round and dominate wall time
    on small graphs, while a modest batch keeps both plan depth and job
    count bounded.  Cadence re-measured r13 on the q114 TextRank graph
    (10 rounds, sf0.1, interleaved): every-3 ≈ every-2 ≈ 2.09 s median vs
    every-5 at 2.54 s — a 5-round-deep plan nests five broadcast builds
    and its optimization cost exceeds the extra checkpoint job, hence the
    default of 3 (identical output at any cadence, diff-checked).

    ``checkpoint_table`` (cluster scale): the edge-share and node tables
    are written ONCE as bucketed tables keyed on their join keys
    (``src`` / ``node``), so every round's contribution join reads the
    big edge side with NO Exchange — only the (node, rank) pairs shuffle
    per round, which is the minimum any power iteration moves.
    """
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    )
    if symmetric:
        # Mirror by exploding each edge into both directions in ONE scan
        # of the upstream plan — union(e, e.flipped) would execute the
        # (possibly expensive) edge-building lineage twice, since Spark
        # has no DAG-level CSE across union branches (measured 2x on the
        # connected-components mirror, dedup.py — same shape here: q114's
        # co-occurrence explode is the upstream plan).
        e = e.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("src").alias("src"),
                        F.col("dst").alias("dst"),
                        F.col("w").alias("w"),
                    ),
                    F.struct(
                        F.col("dst").alias("src"),
                        F.col("src").alias("dst"),
                        F.col("w").alias("w"),
                    ),
                )
            ).alias("e")
        ).select("e.src", "e.dst", "e.w")
    # Merge parallel edges once so contributions are never double-counted.
    e = e.groupBy("src", "dst").agg(F.sum("w").alias("w"))
    strength = e.groupBy("src").agg(F.sum("w").alias("strength"))
    # Edges pre-joined to their source strength: the per-round join then
    # touches only this one materialized table.
    e = e.join(strength, "src").select(
        "src", "dst", (F.col("w") / F.col("strength")).alias("share")
    )
    if checkpoint_table:
        from sanctum_spark.operators.ckpt import bucketed_checkpoint

        e = bucketed_checkpoint(e, f"{checkpoint_table}_edges", "src", n_buckets)
        nodes = bucketed_checkpoint(
            e.select(F.col("src").alias("node")).distinct(),
            f"{checkpoint_table}_nodes",
            "node",
            n_buckets,
        )
    else:
        e = e.localCheckpoint(eager=True)
        nodes = (
            e.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=True)
        )
    # Node count stays in the plan as a broadcast single-row aggregate —
    # no driver-side collect of data-dependent values.
    n = nodes.agg(F.count(F.lit(1)).alias("n"))

    # No checkpoint on the initial ranks (r13): each round references
    # `ranks` exactly once (the contribution join), so there is no
    # double-eval to guard against, and the init is one cheap projection
    # over the already-checkpointed nodes — cutting one eager job from
    # the setup path.
    #
    # r14 (guide §2.4, §7 "driver round-trips"): in a MIRRORED graph
    # every node has in-edges (each outgoing edge implies the reverse),
    # so the contribution aggregate already covers every node and the
    # per-round `nodes` left-join plus its broadcast(n) attach are
    # redundant — the coalesce branch can never fire.  Carrying `n` as
    # a column through the rounds (one BIGINT per node; constant value,
    # min() in the aggregate is exact) lets each round be ONE join +
    # ONE aggregate: 2 AQE jobs instead of 4 (measured 48 -> ~22 jobs
    # on q114's 10-round TextRank, where the graph is tiny and jobs ARE
    # the cost).  Rank values are bit-identical: the contribution
    # aggregate subtree is unchanged, and (1-d)/n + d*contrib is the
    # same expression the left-join form evaluated.  The directed path
    # (symmetric=False) keeps the left join — source-only nodes really
    # do need the teleport-only row there.
    if symmetric:
        ranks = nodes.join(F.broadcast(n)).select(
            "node", (F.lit(1.0) / F.col("n")).alias("rank"), F.col("n")
        )
    else:
        ranks = nodes.join(F.broadcast(n)).select(
            "node", (F.lit(1.0) / F.col("n")).alias("rank")
        )

    for i in range(n_iter):
        if symmetric:
            contrib = (
                e.join(ranks, e.src == ranks.node)
                .groupBy("dst")
                .agg(
                    F.sum(F.col("rank") * F.col("share")).alias("contrib"),
                    F.min("n").alias("n"),
                )
            )
            ranks = contrib.select(
                F.col("dst").alias("node"),
                (
                    (1.0 - damping) / F.col("n")
                    + damping * F.col("contrib")
                ).alias("rank"),
                F.col("n"),
            )
        else:
            contrib = (
                e.join(ranks, e.src == ranks.node)
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("share")).alias("contrib"))
            )
            ranks = (
                nodes.join(contrib, nodes.node == contrib.dst, "left")
                .join(F.broadcast(n))
                .select(
                    "node",
                    (
                        (1.0 - damping) / F.col("n")
                        + damping * F.coalesce(F.col("contrib"), F.lit(0.0))
                    ).alias("rank"),
                )
            )
        if checkpoint_every > 0 and (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank") if symmetric else ranks
