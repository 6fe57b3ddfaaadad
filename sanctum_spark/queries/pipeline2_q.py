"""Pipeline queries, batch 2: CDC upsert compaction, cohort retention,
lateral top-k subqueries, weighted TextRank keyword extraction.

Every oracle is exact-deterministic (struct-max/tie-broken windows,
integer week arithmetic, rounded fixed-iteration ranks) so the driver's
hash compare stays meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sanctum_spark.io import load_table, parquet_split_count, register_views, spread_scan
from sanctum_spark.queries import register
from sanctum_spark.queries.util import sql_codepoint_levenshtein, stable_round

_WEEK_NS = 7 * 86_400 * 1_000_000_000


@register(
    "q111_cdc_upsert",
    r"""
    WITH latest AS (
        SELECT user_id AS key, event_type, ROUND(value + 1e-9, 2) AS val,
               epoch_us(ts) AS ts_us,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts) DESC, event_id DESC)
                   AS rn
        FROM events
    ),
    chg AS (SELECT key, event_type, val, ts_us FROM latest WHERE rn = 1),
    base AS (SELECT c_custkey AS key, ROUND(c_acctbal + 1e-9, 2) AS val
             FROM customer)
    SELECT COALESCE(b.key, c.key) AS key,
           CASE WHEN c.key IS NULL THEN b.val ELSE c.val END AS val,
           CASE WHEN c.key IS NULL THEN 'base' ELSE 'changelog' END AS src,
           COALESCE(c.ts_us, 0) AS version_ts_us
    FROM base b FULL OUTER JOIN chg c ON b.key = c.key
    WHERE c.key IS NULL OR c.event_type <> 'error'
    """,
    doc=(
        "CDC upsert compaction (MERGE semantics without Delta): the event "
        "stream is a changelog keyed on user_id — the LATEST entry per key "
        "wins (error = tombstone deletes, anything else upserts value), "
        "applied to the customer base table via one full-outer join: "
        "untouched base rows survive, matched keys update or die, "
        "changelog-only keys insert. Latest-per-key uses a max_by struct "
        "aggregate ((ts_ns, event_id) is a total order) — ONE combinable "
        "shuffle, no window sort of the changelog. At 100 TB: base and "
        "changelog bucketed on the key make the outer join shuffle-free; "
        "this is the compaction loop of any snapshot+log table format."
    ),
)
def q111(spark: SparkSession, sf_dir: str) -> DataFrame:
    # version precision is MICROSECONDS on both sides: DuckDB truncates
    # the parquet TIMESTAMP(NANOS) column to a us TIMESTAMP, so exact-ns
    # versions can never hash-match (ts_us == ts_ns div 1000 — same floor).
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    chg = (
        ev.groupBy(F.col("user_id").alias("key"))
        .agg(
            F.max(
                F.struct(
                    "ts_us", "event_id", F.col("event_type"), F.col("value")
                )
            ).alias("last")
        )
        .select(
            "key",
            F.col("last.event_type").alias("event_type"),
            stable_round(F.col("last.value"), 2).alias("cval"),
            F.col("last.ts_us").alias("ts_us"),
        )
    )
    base = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("bkey"),
        stable_round(F.col("c_acctbal"), 2).alias("bval"),
    )
    joined = base.join(chg, base.bkey == chg.key, "full_outer")
    return joined.filter(
        F.col("key").isNull() | (F.col("event_type") != "error")
    ).select(
        F.coalesce("bkey", "key").alias("key"),
        F.when(F.col("key").isNull(), F.col("bval"))
        .otherwise(F.col("cval"))
        .alias("val"),
        F.when(F.col("key").isNull(), F.lit("base"))
        .otherwise(F.lit("changelog"))
        .alias("src"),
        F.coalesce("ts_us", F.lit(0)).alias("version_ts_us"),
    )


@register(
    "q112_cohort_retention",
    r"""
    WITH a AS (SELECT user_id, epoch_ns(ts) // 604800000000000 AS wk
               FROM events WHERE event_type = 'purchase'),
    f AS (SELECT user_id, MIN(wk) AS cohort FROM a GROUP BY user_id),
    act AS (SELECT DISTINCT a.user_id, f.cohort, a.wk - f.cohort
                AS weeks_since
            FROM a JOIN f USING (user_id))
    SELECT cohort, weeks_since, COUNT(*) AS n_users
    FROM act GROUP BY cohort, weeks_since
    """,
    doc=(
        "cohort retention triangle: users grouped by first-purchase week "
        "(integer epoch-week arithmetic — div on exact nanos, no calendar "
        "truncation to diverge across engines/timezones), counted as "
        "retained in each later week they purchased again. Three "
        "aggregations all keyed on user_id, so one repartition serves "
        "the whole pipeline; the cohort map is user-grain (broadcastable "
        "against the activity table at any event volume)."
    ),
)
def q112(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    a = ev.select(
        "user_id", F.expr(f"ts_ns div {_WEEK_NS}").alias("wk")
    )
    first = a.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    act = (
        a.join(first, "user_id")
        .select("user_id", "cohort", (F.col("wk") - F.col("cohort")).alias("weeks_since"))
        .distinct()
    )
    return act.groupBy("cohort", "weeks_since").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@register(
    "q113_lateral_topk",
    r"""
    SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 3
    ) t
    """,
    doc=(
        "correlated LATERAL subquery (top-3 orders per customer) through "
        "the SQL surface — the per-row-subquery shape users write "
        "naturally. Catalyst decorrelates it into WindowGroupLimit "
        "(partial per-partition top-k BEFORE the shuffle, then final) + "
        "one join — no per-customer execution, no full sort; the partial "
        "group-limit bounds the exchange to <= 3 rows per customer per "
        "task regardless of order-history depth. Identical SQL runs on "
        "both engines."
    ),
)
def q113(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
        FROM customer c, LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 3
        ) t
        """
    )


def _textrank_oracle(n_iter: int = 10, d: float = 0.85) -> str:
    """Unrolled fixed-iteration weighted-PageRank oracle: one CTE per
    power-iteration step (recursive-CTE terms can't aggregate)."""
    head = r"""
    WITH t AS (
        SELECT string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents
    ),
    p AS (
        SELECT unnest(list_concat(
            list_transform(generate_series(1, len(toks) - 1),
                           i -> struct_pack(w1 := toks[i], w2 := toks[i+1])),
            list_transform(generate_series(1, len(toks) - 2),
                           i -> struct_pack(w1 := toks[i], w2 := toks[i+2]))
        )) AS pr FROM t
    ),
    c0 AS (SELECT pr.w1 AS src, pr.w2 AS dst, COUNT(*) AS w FROM p
           WHERE pr.w1 <> pr.w2 GROUP BY 1, 2),
    ed AS (SELECT src, dst, CAST(SUM(w) AS DOUBLE) AS w FROM (
               SELECT src, dst, w FROM c0
               UNION ALL SELECT dst, src, w FROM c0) GROUP BY 1, 2),
    deg AS (SELECT src, SUM(w) AS strength FROM ed GROUP BY src),
    n AS (SELECT COUNT(*) AS n FROM deg),
    r0 AS (SELECT src AS node, 1.0 / nn.n AS rank FROM deg CROSS JOIN n nn)
    """
    its = []
    for i in range(1, n_iter + 1):
        its.append(
            f"""
    r{i} AS (
        SELECT d.src AS node,
               (1.0 - {d}) / nn.n + {d} * COALESCE(s.contrib, 0) AS rank
        FROM deg d CROSS JOIN n nn
        LEFT JOIN (
            SELECT ed.dst AS nd, SUM(r.rank * ed.w / rd.strength) AS contrib
            FROM ed JOIN r{i - 1} r ON r.node = ed.src
                    JOIN deg rd ON rd.src = ed.src
            GROUP BY ed.dst) s ON s.nd = d.src
    )"""
        )
    return (
        head
        + ","
        + ",".join(its)
        + f"""
    SELECT node, ROUND(rank + 1e-9, 6) AS rank
    FROM r{n_iter}
    ORDER BY ROUND(rank + 1e-9, 6) DESC, node ASC
    LIMIT 20
    """
    )


@register(
    "q114_textrank_keywords",
    _textrank_oracle(),
    doc=(
        "TextRank keyword extraction (Mihalcea & Tarau 2004): weighted "
        "PageRank over the word co-occurrence graph (edge weight = pair "
        "count from the q109 window), 10 fixed power-iteration rounds, "
        "top-20 terms. Fixed iteration count + rounded rank sort key make "
        "an iterative algorithm exactly cross-engine comparable — the "
        "DuckDB oracle is the same 10 steps unrolled as CTEs. Spark side: "
        "operators.graph.pagerank — per round ONE (node, rank) shuffle "
        "against a once-materialized (edge, share) table; corpus text "
        "never re-enters the loop. Graph size is vocab-bounded, not "
        "corpus-bounded."
    ),
)
def q114(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctum_spark.operators.graph import pagerank
    from sanctum_spark.operators.text import cooccurrence_pairs

    # spread_scan: the co-occurrence explode + pair groupBy that feeds
    # the edge materialization is the dominant phase (28.6 s cold /
    # 1.1 s warm at sf0.1, single-task scan) — fan it out before the
    # derivation (r13 paired A/B median 0.92 warm, 0.63 cold-window).
    docs = spread_scan(
        load_table(spark, sf_dir, "documents"),
        parquet_split_count(sf_dir, "documents"),
    )
    counts = (
        cooccurrence_pairs(docs, "text", window=2)
        .filter(F.col("w1") != F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    ranks = pagerank(
        counts, src_col="w1", dst_col="w2", weight_col="w", n_iter=10
    )
    r6 = stable_round(F.col("rank"), 6)
    return (
        ranks.select(F.col("node"), r6.alias("rank"))
        .orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(20)
    )


@register(
    "q115_fuzzy_vocab",
    rf"""
    WITH v AS (SELECT DISTINCT unnest(
                   string_split_regex(lower(trim(text)), '\s+')) AS w
               FROM documents),
    cand AS (
        SELECT a.w AS w1, b.w AS w2,
               {sql_codepoint_levenshtein("a.w", "b.w")} AS dist
        FROM v a JOIN v b
          ON abs(length(a.w) - length(b.w)) <= 2
         AND a.w < b.w
    )
    SELECT w1, w2, dist FROM cand WHERE dist <= 2
    """,
    doc=(
        "fuzzy vocabulary matching: token pairs within Levenshtein "
        "distance 2 — the typo/variant clustering step of vocab "
        "normalization. Candidates are length-band blocked (edit distance "
        ">= length difference, so |len diff| <= 2 is exact, not a "
        "heuristic) over the DISTINCT'd vocabulary, which is bounded by "
        "corpus vocabulary, not corpus size; the distance UDF-free "
        "levenshtein runs only on survivors. The oracle distance is "
        "CODE-POINT-true on any vocabulary via an injective per-pair "
        "recode to single-byte ASCII (util.sql_codepoint_levenshtein, "
        "r7 — previously exact for ASCII only; the raw library "
        "divergence stays pinned in tests/test_edge_invariants_b10.py). "
        "At a 10^6-word real vocab "
        "the pair space needs q-gram prefix filtering (EDJoin/PassJoin) "
        "before the verify — same candidates-then-verify shape as the "
        "MinHash family."
    ),
)
def q115(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctum_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    v = (
        docs.select(
            F.explode(F.transform(tokens(F.col("text")), lambda w: F.lower(w))).alias("w")
        )
        .distinct()
    )
    a = v.select(F.col("w").alias("w1"))
    b = v.select(F.col("w").alias("w2"))
    cand = a.join(
        b,
        (F.abs(F.length("w1") - F.length("w2")) <= 2) & (F.col("w1") < F.col("w2")),
    )
    return cand.select(
        "w1", "w2", F.levenshtein("w1", "w2").cast("long").alias("dist")
    ).filter(F.col("dist") <= 2)


@register(
    "q116_winsorize",
    r"""
    WITH p AS (SELECT l_returnflag,
                      quantile_cont(l_extendedprice, 0.05) AS lo,
                      quantile_cont(l_extendedprice, 0.95) AS hi
               FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag,
           ROUND(AVG(l_extendedprice) + 1e-9, 4) AS avg_raw,
           ROUND(AVG(LEAST(GREATEST(l_extendedprice, lo), hi)) + 1e-9, 4)
               AS avg_wins,
           CAST(SUM(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM lineitem l JOIN p USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
    doc=(
        "percentile winsorization (outlier clipping): per-group exact "
        "P05/P95 computed once (group-grain, tiny), BROADCAST back onto "
        "the fact, values clamped JVM-side — the two-pass clip every "
        "quality pipeline runs before averaging noisy metrics. The "
        "percentile table is group-count-sized at any data volume, so "
        "the second pass is scan + broadcast join + agg; n_clipped "
        "is deterministic because no data point can lie strictly "
        "between the two adjacent order stats an interpolated quantile "
        "falls between."
    ),
)
def q116(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.05)).alias("lo"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("hi"),
    )
    x = F.col("l_extendedprice")
    clipped = F.least(F.greatest(x, F.col("lo")), F.col("hi"))
    return (
        li.join(F.broadcast(p), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            stable_round(F.avg(x), 4).alias("avg_raw"),
            stable_round(F.avg(clipped), 4).alias("avg_wins"),
            F.sum(
                F.when((x < F.col("lo")) | (x > F.col("hi")), 1).otherwise(0)
            ).alias("n_clipped"),
        )
    )


@register(
    "q117_group_sample",
    r"""
    WITH r AS (SELECT user_id, event_id, value,
                      ROW_NUMBER() OVER (
                          PARTITION BY user_id
                          ORDER BY md5(CAST(event_id AS VARCHAR)), event_id)
                          AS rn
               FROM events)
    SELECT user_id, event_id, ROUND(value + 1e-9, 2) AS val
    FROM r WHERE rn <= 5
    """,
    doc=(
        "deterministic per-group k-sample: exactly 5 events per user, "
        "chosen by md5-hash order — reproducible across engines, runs "
        "and cluster layouts (no RNG state, unlike rand()-based "
        "sampling), uniform-ish because the hash decorrelates from "
        "insertion order. The ranking window becomes partial+final "
        "WindowGroupLimit, so each task forwards at most k rows per "
        "group to the shuffle — per-group reservoir sampling at scale "
        "without a stateful pass."
    ),
)
def q117(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("user_id", "event_id", stable_round(F.col("value"), 2).alias("val"))
    )


@register(
    "q118_histogram",
    r"""
    WITH mm AS (SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
                FROM events GROUP BY event_type)
    SELECT e.event_type,
           COALESCE(LEAST(CAST(floor((value - lo) * 10 / NULLIF(hi - lo, 0))
                               AS BIGINT), 9), 0) AS bin,
           COUNT(*) AS n
    FROM events e JOIN mm USING (event_type)
    GROUP BY e.event_type, bin
    """,
    doc=(
        "two-pass equi-width histogram (10 bins per event type): pass 1 "
        "computes per-group min/max (group-grain, tiny, BROADCAST back), "
        "pass 2 bins every value JVM-side — the distribution profile "
        "step of data validation. Bin arithmetic is the identical IEEE "
        "expression ((v-lo)*10/(hi-lo), floor, clamp) on both engines, "
        "so bucket assignment is exactly reproducible; degenerate "
        "constant groups (hi == lo) collapse to bin 9: the NULLIF guard "
        "turns the bin expression NULL and LEAST(NULL, 9) skips NULLs on "
        "both engines — never a divide error (pinned in "
        "tests/test_edge_invariants_b6.py)."
    ),
)
def q118(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mm = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    bin_col = F.coalesce(
        F.least(
            F.floor(
                (F.col("value") - F.col("lo"))
                * 10
                / F.nullif(F.col("hi") - F.col("lo"), F.lit(0))
            ).cast("long"),
            F.lit(9),
        ),
        F.lit(0),
    )
    return (
        ev.join(F.broadcast(mm), "event_type")
        .groupBy("event_type", bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
