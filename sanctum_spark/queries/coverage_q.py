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
from sanctum_spark.queries.util import int_grain, sql_int_grain, sql_json_int, stable_round


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
        "Plane count is derived from the corpus size (sized_lsh: expected "
        "bucket <= 1024 vectors), so the within-bucket pair join stays "
        "~n*1024/2 rather than n^2/2^const as the corpus grows. Rows-only; "
        "completeness vs the brute-force pair join asserted in "
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
           ROUND(CASE WHEN ABS(SUM(value)) <= 1e-9 * SUM(ABS(value))
                      THEN NULL
                      ELSE SUM(value * value) / SUM(value) END + 1e-9, 4)
               AS self_weighted
    FROM events
    GROUP BY user_id
    """,
    doc=(
        "grouped-aggregate pandas UDF (UDAF): Arrow-batched numpy "
        "reduction per group, oracle-checked against its closed form. "
        "Mixed-sign groups whose weight mass cancels (|sum| <= 1e-9 * "
        "sum|v|) yield NULL on BOTH engines via the same relative "
        "threshold — an exact ==0.0 guard left the knife-edge where one "
        "engine accumulates 0.0 and the other ~1e-13 (r6 ADVICE item 4)."
    ),
)
def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    @F.pandas_udf("double")
    def self_weighted(v: pd.Series) -> float:
        # value-weighted mean of value: sum(v^2)/sum(v). NULL when the
        # weight mass cancels: a relative threshold (|sum| vs sum of
        # |v|) is derivable identically on both engines, unlike ==0.0.
        # RESIDUAL DOMAIN NOTE (cf. util.py pin-domain): a group whose
        # true |sum| sits within ~1 ulp of 1e-9*sum|v| itself can still
        # flip the CASE between engines via summation order — at that
        # boundary self_weighted is ~1e9x the data scale, i.e. outside
        # the pin's meaningful domain, like the |x|>=1e12 ROUND pins.
        s = float(v.sum())
        mass = float(v.abs().sum())
        return None if abs(s) <= 1e-9 * mass else float((v * v).sum() / s)

    return ev.groupBy("user_id").agg(
        stable_round(self_weighted("value"), 4).alias("self_weighted")
    )


@register(
    "q84_spell_fanout_udtf",
    f"""
    SELECT e.event_id, CAST(s.i AS BIGINT) AS copy_idx,
           {sql_int_grain("e.value / e.n", 2)} AS share_e2
    FROM (
        SELECT event_id, value,
               {sql_json_int("props", "'$.k'")} % 3 + 1 AS n
        FROM events
    ) e
    JOIN (SELECT UNNEST([1, 2, 3]) AS i) s ON s.i <= e.n
    """,
    doc=(
        "row-generating spell (UDTF, 1→N): each event fans out into "
        "k%3+1 equal shares — the reference's N:M roadmap (README.md:131) "
        "as a mapInPandas generator. The share is pinned at integer e2 "
        "grain with the identical IEEE expression floor(v/n*100+0.5+1e-9) "
        "in the Python generator and the SQL oracle: the prior "
        "ROUND(v/n, 2) pair diverged in the last digit when v/n sits "
        "within an ulp of a .xx5 boundary (engine round() implementations "
        "differ in op sequence — r6 fuzz sweep, seed 2)."
    ),
)
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "value",
        (F.get_json_object("props", "$.k").try_cast("long") % 3 + 1).alias("n_copies"),
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("copy_idx", T.LongType()),
            T.StructField("share_e2", T.LongType()),
        ]
    )

    def fanout(batches):
        import numpy as np

        for pdf in batches:
            # Vectorized fan-out (r10 verdict task #3 — the former
            # to_dict("records") row loop was the only per-row Python in a
            # registered query's Arrow batch).  Row filter first, matching
            # the oracle's `s.i <= e.n`:
            #  - NULL/malformed $.k (n_copies NaN through Arrow) → no rows;
            #  - n < 1 (negative k: k%3 follows the dividend sign in both
            #    Spark and DuckDB, so n can be 0 or -1) → no rows, and the
            #    filter runs BEFORE the v/n division (r6 ADVICE item 1).
            n_f = pd.to_numeric(pdf["n_copies"], errors="coerce").to_numpy(
                dtype="float64", na_value=np.nan
            )
            keep = ~np.isnan(n_f) & (n_f >= 1)
            reps = n_f[keep].astype("int64")
            v = pdf["value"].to_numpy(dtype="float64", na_value=np.nan)[keep]
            # The int_grain pin, written as the SAME IEEE double op
            # sequence the oracle evaluates — (v / n) * 100.0 + 0.5 +
            # 1e-9, then an exact floor.  numpy float64 executes the
            # identical op sequence elementwise that the scalar kernel
            # ran per row, so the pinned ints stay bit-exact (r6 fuzz
            # pin, seed 2).  NULL value with a parsable k: NaN flows
            # through to a masked (NULL) share while the fan-out rows
            # are still emitted, as the oracle does.
            share_f = np.floor((v / reps) * 100.0 + 0.5 + 1e-9)
            # 1→N expansion: repeat each source row n times and number
            # the copies 1..n with a repeated-group-start subtraction.
            row_idx = np.repeat(np.arange(reps.size, dtype="int64"), reps)
            starts = np.cumsum(reps) - reps
            copy_idx = (
                np.arange(row_idx.size, dtype="int64")
                - np.repeat(starts, reps)
                + 1
            )
            share_rep = share_f[row_idx]
            null_mask = np.isnan(share_rep)
            share = pd.arrays.IntegerArray(
                np.where(null_mask, 0, share_rep).astype("int64"), null_mask
            )
            # event_id is a non-null key in the fixtures, but a nullable
            # arrival through Arrow delivers float64-with-NaN and the raw
            # int64 cast is undefined — fail loudly instead of emitting
            # garbage ids.
            assert pdf["event_id"].notna().all(), "NULL event_id in batch"
            event_id = (
                pdf["event_id"].to_numpy(dtype="int64")[keep][row_idx]
                if row_idx.size
                else np.empty(0, dtype="int64")
            )
            yield pd.DataFrame({
                "event_id": pd.array(event_id, dtype="int64"),
                "copy_idx": pd.array(copy_idx, dtype="int64"),
                # nullable Int64: NULL-value shares stay NULL through Arrow
                "share_e2": share,
            })

    return ev.mapInPandas(fanout, schema=schema)


@register(
    "q85_grouped_map_normalize",
    """
    SELECT user_id, event_id,
           ROUND((value - AVG(value) OVER w) / stddev_samp(value) OVER w + 1e-9, 5)
               AS value_z
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
    doc=(
        "per-user z-score normalization as pure-JVM window aggregates "
        "(one user_id exchange, zero Python — the r13 rewrite of the "
        "original grouped-map applyInPandas form; grouped-map coverage "
        "lives in tests/test_operators.py and q83's grouped-agg UDAF), "
        "oracle-checked against the identical window form."
    ),
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 optimization (guide §4.1): the original grouped-map
    # applyInPandas shipped EVERY event row JVM->Python->JVM
    # (FlatMapGroupsInPandas) just to compute a per-group mean/stddev —
    # the z-score is expressible as unbounded window aggregates, which
    # run inside whole-stage codegen on the same single user_id
    # exchange.  Semantics preserved exactly (oracle is this window
    # form): avg/stddev_samp skip NULLs like pandas mean/std skip NaN;
    # a single-row group's stddev_samp is NULL (pandas NaN -> both NaN
    # under the driver hash); try_divide maps the all-equal-group 0/0
    # to NULL where pandas produced NaN (ANSI mode would otherwise
    # raise DIVIDE_BY_ZERO).  The grouped-map surface itself stays
    # covered by tests/test_operators.py and the q83 grouped-agg UDAF.
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    w = W.partitionBy("user_id")
    z = F.try_divide(
        F.col("value") - F.avg("value").over(w),
        F.stddev_samp("value").over(w),
    )
    return ev.select(
        "user_id", "event_id", stable_round(z, 5).alias("value_z")
    )


@register(
    "q86_event_sequence",
    """
    SELECT c.user_id, COUNT(DISTINCT c.event_id) AS n_converting_clicks
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase'
     AND epoch_ns(p.ts) > epoch_ns(c.ts)
     AND epoch_ns(p.ts) <= epoch_ns(c.ts) + 1800000000000
    WHERE c.event_type = 'click'
    GROUP BY c.user_id
    """,
    doc=(
        "CEP-style sequence pattern: click followed by a purchase within "
        "30 min by the same user (exact-ns band self-join — the batch "
        "form of MATCH_RECOGNIZE-style pattern detection)."
    ),
)
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("c_id"),
        F.col("ts_ns").alias("c_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts_ns").alias("p_ts")
    )
    j = clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.lit(1_800_000_000_000)),
    )
    return j.groupBy(F.col("c_user").alias("user_id")).agg(
        F.countDistinct("c_id").alias("n_converting_clicks")
    )


@register(
    "q87_approx_percentile",
    None,
    doc=(
        "approx_percentile (t-digest-style sketch) per group; no oracle — "
        "sketch results are engine-specific. Accuracy vs the exact "
        "percentile asserted in tests/test_operators.py."
    ),
)
def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "approx_median"
        ),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact_median"),
    )


@register(
    "q88_user_correlation",
    f"""
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS h,
               CAST(SUM({sql_int_grain('value', 3)}) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ),
    active AS (
        SELECT user_id FROM hourly GROUP BY 1 HAVING COUNT(*) >= 5
    ),
    ha AS (
        SELECT * FROM hourly WHERE user_id IN (SELECT user_id FROM active)
    ),
    pairs AS (
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               ROUND(corr(a.v, b.v) + 1e-9, 4) AS value_corr,
               COUNT(*) AS n_hours
        FROM ha a JOIN ha b
          ON a.h = b.h AND a.user_id < b.user_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= 5
    ),
    sym AS (
        SELECT user_a AS user_id, user_b AS partner_id, value_corr, n_hours
        FROM pairs
        UNION ALL
        SELECT user_b, user_a, value_corr, n_hours FROM pairs
    )
    SELECT user_id, partner_id, value_corr, n_hours
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id
            ORDER BY value_corr DESC NULLS LAST, n_hours DESC, partner_id ASC
        ) AS rn FROM sym
    )
    WHERE rn <= 3
    """,
    doc=(
        "time-series similarity: per-user hourly value series aligned on "
        "the hour bucket, pairwise Pearson correlation, reported as each "
        "user's TOP-3 most-correlated partners. Scale shape: the pairing "
        "stage runs on a (user_id, hour)-only projection (16-byte "
        "payload), a per-user >=5-active-hours pre-filter drops the "
        "one-off-user long tail first, and — critically — the OUTPUT is "
        "bounded O(users*k) by a per-user top-k (grouped_topk window), "
        "not Theta(users^2): at 100x users the answer grows 100x, not "
        "10,000x. Two-phase block-then-verify variants were measured and "
        "rejected at this density (see in-code note); the top-k bound is "
        "what survives any density. The hourly series is pinned at "
        "integer e3 grain (exact BIGINT sums both engines) — Pearson "
        "correlation is scale-invariant, so value_corr is unchanged, but "
        "the prior ROUND(SUM(value), 2) input pin flipped at .xx5 "
        "boundaries under engine summation-order ulps and swung small-n "
        "correlations by whole percents (r6 fuzz sweep)."
    ),
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(int_grain(F.col("value"), 3)).alias("v"))

    # A pair needs >=5 shared hours, so each member needs >=5 active
    # hours: a LINEAR pre-filter that removes the low-activity user tail
    # before the pairing join ever sees it. At 100 TB that tail (one-off
    # users) dominates row counts; here it is the only pruning that is
    # both exact and ahead of the quadratic stage.
    #
    # r14 (guide §2.4): the filter is a COUNT WINDOW over the hourly
    # aggregate, not a groupBy + semi-join back — the window rides the
    # user_id-compatible exchange, so the activity agg job, its
    # broadcast build, and (critically) the DOUBLE evaluation of the
    # un-persisted semi-join on both pairing sides all disappear; the
    # persisted cut moves to the FILTERED table, which is exactly what
    # both join sides read.  Paired A/B (6 pairs, one JVM, sf0.1):
    # median ratio 0.505, 14 -> 10 jobs, full symmetric diff identical.
    hourly = (
        hourly.withColumn(
            "_nh", F.count(F.lit(1)).over(W.partitionBy("user_id"))
        )
        .filter(F.col("_nh") >= 5)
        .drop("_nh")
    )
    # Reused by both sides of the pairing join; eager persist so AQE's
    # concurrent child stages don't race to recompute the aggregation
    # (see q74 note). On a cluster this would be a checkpoint / staged
    # parquet write instead.
    hourly = hourly.persist()
    hourly.count()

    # Single-pass pairing + one aggregation building all six corr partials
    # map-side. Two-phase "block then verify" variants (slim count join →
    # corr only on candidates) were built and MEASURED at sf0.1: 6.5 s
    # (candidates × series join-back) and 13.1 s (candidate-user semi +
    # re-pair) vs 4.2 s for this plan — because this dataset's output is
    # itself quadratic (~750k pairs from ~1.5k users, ~100% pair density),
    # so blocking prunes nothing and just pays the pairing join twice.
    # Blocking only wins when the >=5-shared-hours filter is selective;
    # the pre-filter above is what survives at any density.
    a = hourly.alias("a")
    b = hourly.alias("b")
    # pairwise deletion (the q89 pattern): corr() drops an hour when
    # EITHER series is NULL there (a user whose only events that hour
    # carried NULL values). stddev_pop over the raw column would use
    # that column's own non-null hours and diverge from DuckDB corr on
    # mixed-null series — found live by the r6 fuzz sweep.
    _both_nn = F.col("a.v").isNotNull() & F.col("b.v").isNotNull()
    av = F.when(_both_nn, F.col("a.v"))
    bv = F.when(_both_nn, F.col("b.v"))
    pairs = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.user_id") < F.col("b.user_id")))
        .groupBy(
            F.col("a.user_id").alias("user_a"), F.col("b.user_id").alias("user_b")
        )
        .agg(
            # Pearson corr from RAW INTEGER MOMENTS (r13, guide §2.3
            # "narrower types / aggregate before you shuffle"): v is an
            # exact BIGINT (e3 grain), so count/sum/sum-of-products are
            # exact integer partials — 6 narrow buffers instead of the
            # 11 doubles covar_pop + 2x stddev_pop carry, and the only
            # float rounding is the final closed form, so the result is
            # summation-order-independent (stronger than the Welford
            # buffers it replaces, not just equal: interleaved paired
            # A/B diff rows 0/0 at sf0.1, median pair ratio 0.91, and
            # the cold-window tail tightened 8.2 s -> 3.8 s).
            # Overflow bound (longs wrap silently in non-ANSI): the
            # largest term is n*sum(av*bv) <= n_hours^2 * max(v)^2; at
            # sf0.1 that is 720^2 * (5.6e5)^2 = 1.6e17, 57x under
            # 2^63 — safe while per-user-hour |v| < ~4.2e6 (e3-grain
            # |value| mass < ~4200/user-hour; measured max 560).
            # try_divide: degenerate series (n=1 or zero variance) have
            # a zero denominator and yield NULL — matching DuckDB corr's
            # NULL semantics, exactly as the covar_pop form did.  F.corr
            # itself stays an ANSI landmine (see git history).
            stable_round(
                F.try_divide(
                    (F.count(av) * F.sum(av * bv) - F.sum(av) * F.sum(bv)).cast(
                        "double"
                    ),
                    F.sqrt(
                        (F.count(av) * F.sum(av * av) - F.sum(av) * F.sum(av)).cast(
                            "double"
                        )
                    )
                    * F.sqrt(
                        (F.count(av) * F.sum(bv * bv) - F.sum(bv) * F.sum(bv)).cast(
                            "double"
                        )
                    ),
                ),
                4,
            ).alias("value_corr"),
            F.count(F.lit(1)).alias("n_hours"),
        )
        .filter(F.col("n_hours") >= 5)
    )
    # Bound the OUTPUT: each (a<b) pair serves both members, then a
    # per-user top-3 window keeps the result O(users*k) regardless of
    # pair density (rank on the ROUNDED corr so both engines see the
    # same order; ties broken by n_hours desc, partner asc — total).
    # The union references `pairs` twice, so materialize the (bounded,
    # 4-column) pair table first — without this the expensive pairing
    # aggregate executes twice (A/B in one JVM at sf0.1: ~3.2-4.4 s
    # double-eval vs ~0.7-1.6 s materialized; persist and localCheckpoint
    # measure the same, checkpoint chosen so downstream stages keep AQE
    # re-planning rights over the cut lineage).
    from sanctum_spark.operators.topk import grouped_topk

    pairs = pairs.localCheckpoint(eager=True)
    sym = pairs.select(
        F.col("user_a").alias("user_id"),
        F.col("user_b").alias("partner_id"),
        "value_corr",
        "n_hours",
    ).unionAll(
        pairs.select(
            F.col("user_b").alias("user_id"),
            F.col("user_a").alias("partner_id"),
            "value_corr",
            "n_hours",
        )
    )
    return grouped_topk(
        sym,
        ["user_id"],
        [
            F.col("value_corr").desc_nulls_last(),
            F.col("n_hours").desc(),
            F.col("partner_id").asc(),
        ],
        3,
    )


@register(
    "q89_dispersion",
    f"""
    SELECT event_type,
           ROUND(stddev_samp(value) + 1e-9, 4)       AS sd,
           ROUND(var_samp(value) + 1e-9, 4)          AS var,
           ROUND(covar_samp(value,
                 {sql_json_int("props", "'$.k'")}) + 1e-9, 4)
                                                     AS cov_vk,
           ROUND(corr(value,
                 {sql_json_int("props", "'$.k'")}) + 1e-9, 6)
                                                     AS corr_vk
    FROM events
    GROUP BY event_type
    """,
    doc=(
        "dispersion aggregates: stddev/variance/covariance/correlation. "
        "corr is computed as try_divide(covar_pop, sx_pop*sy_pop) over "
        "PAIRWISE-COMPLETE inputs (each stddev sees only rows where BOTH "
        "columns are non-null, the same deletion corr() applies) — "
        "identical to corr() on every input but a zero-variance group "
        "yields NULL instead of the ANSI DIVIDE_BY_ZERO raw F.corr "
        "throws (the q88 landmine; DuckDB corr returns NULL on the same "
        "input, pinned in tests/test_edge_invariants_b8.py)."
    ),
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # try_cast at the VALUE level too: a well-formed props whose $.k
    # is non-numeric ("abc") would abort an ANSI cast; DuckDB oracle
    # mirrors with TRY_CAST (r6 review finding)
    k = F.get_json_object("props", "$.k").try_cast("long")
    # pairwise deletion: corr() drops a row when EITHER side is null;
    # stddev_pop over the raw column would instead use that column's own
    # non-null rows and diverge from the oracle on mixed-null groups
    both = F.col("value").isNotNull() & k.isNotNull()
    vp = F.when(both, F.col("value"))
    kp = F.when(both, k)
    return ev.groupBy("event_type").agg(
        stable_round(F.stddev_samp("value"), 4).alias("sd"),
        stable_round(F.var_samp("value"), 4).alias("var"),
        stable_round(F.covar_samp(F.col("value"), k), 4).alias("cov_vk"),
        stable_round(
            F.try_divide(
                F.covar_pop(vp, kp), F.stddev_pop(vp) * F.stddev_pop(kp)
            ),
            6,
        ).alias("corr_vk"),
    )


@register(
    "q45_right_join",
    """
    SELECT n_nationkey, n_name, COALESCE(cnt, 0) AS n_suppliers
    FROM (SELECT s_nationkey, COUNT(*) AS cnt FROM supplier GROUP BY 1) s
    RIGHT JOIN nation ON s_nationkey = n_nationkey
    """,
    doc="right-outer join (dimension preserved side on the right).",
)
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    nat = load_table(spark, sf_dir, "nation")
    return supp.join(nat, supp.s_nationkey == nat.n_nationkey, "right").select(
        "n_nationkey", "n_name", F.coalesce(F.col("cnt"), F.lit(0)).alias("n_suppliers")
    )
