"""Pipeline queries, batch 7 (round 4, close): record linkage, text
retrieval and privacy release — capability families the registry did not
yet carry as first-class, oracle-paired entries.

- q161: entity resolution over the ``part`` catalog — the classic
  blocking → candidate matching → transitive clustering pipeline
  (Fellegi-Sunter shape, deterministic match rule) via
  ``operators.linkage``.
- q162: BM25 top-k retrieval over ``documents`` — the lexical relevance
  scorer (Robertson/Spärck Jones) that data-selection pipelines use to
  pull topic-relevant subsets out of a web corpus, via
  ``operators.retrieval``.
- q163: k-anonymity release gate — equivalence-class suppression over a
  quasi-identifier grouping, the privacy check before publishing
  event-derived features.
- q164: distinct-individuals floor — q163's companion: released classes
  must also carry at least l distinct user_ids (l-diversity algebra over
  an identifier column, i.e. a k-map-style individual-count bound).

All four carry full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sanctum_spark.io import load_table
from sanctum_spark.queries import register
from sanctum_spark.queries.util import sql_codepoint_levenshtein

# BM25 hyperparameters (the standard Okapi defaults) and the fixed query.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("spark", "shuffle", "partition")
BM25_TOPK = 10


@register(
    "q161_entity_resolution",
    f"""
    WITH RECURSIVE recs AS (
        SELECT p_partkey AS id, p_name AS name, p_brand AS brand,
               p_type AS kind
        FROM part
    ),
    prs AS (
        SELECT a.id AS id_a, b.id AS id_b
        FROM recs a JOIN recs b
          ON a.brand = b.brand AND a.kind = b.kind AND a.id < b.id
         AND abs(length(a.name) - length(b.name)) <= 1
         AND {sql_codepoint_levenshtein("a.name", "b.name")} <= 1
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM prs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM prs
    ),
    reach(id, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
    ),
    comp AS (SELECT id, MIN(label) AS comp_id FROM reach GROUP BY id),
    labeled AS (
        SELECT r.id, r.name, COALESCE(c.comp_id, r.id) AS entity_id
        FROM recs r LEFT JOIN comp c USING (id)
    )
    SELECT entity_id,
           COUNT(*) AS n_records,
           COUNT(DISTINCT name) AS n_names,
           MIN(name) AS canonical_name
    FROM labeled GROUP BY entity_id
    """,
    doc=(
        "entity resolution (record linkage) over the part catalog: "
        "records are the same entity when they share brand and type and "
        "their names are within Levenshtein distance 1 (typo/variant "
        "tolerance; the sf0.01 catalog really contains cold/old name "
        "variants).  Pipeline: BLOCK on the exact (brand, type) keys — "
        "candidate pairs only ever form inside a block, so the fuzzy "
        "predicate never sees the cross product — then a cheap "
        "length-delta pre-filter, then JVM levenshtein on survivors "
        "(code-point distance; the oracle matches it on ANY name via "
        "util.sql_codepoint_levenshtein's injective ASCII recode — r7, "
        "previously exact for ASCII only), "
        "then transitive closure via the shared connected-components "
        "operator (A~B, B~C must land in one entity), then one grouped "
        "aggregate per entity.  Scale shape: the block self-join "
        "shuffles (brand, type, id, name) once on the block key; "
        "within-block work is quadratic in BLOCK size, never corpus "
        "size — at 100 TB the block key must keep per-block cardinality "
        "bounded (add a secondary key, e.g. a name-prefix bucket, when "
        "a block outgrows ~10^4 records; the salted-join helper covers "
        "the skewed-block case).  Components: one (node, label) shuffle "
        "per round, diameter-bounded."
    ),
)
def q161(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctum_spark.operators.linkage import resolve_entities

    recs = _q161_records(spark, sf_dir)
    labeled = resolve_entities(
        recs, "id", block_cols=["brand", "kind"], fuzzy_col="name", max_dist=1
    )
    return labeled.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.countDistinct("name").alias("n_names"),
        F.min("name").alias("canonical_name"),
    )


def _q161_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"),
        F.col("p_name").alias("name"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("kind"),
    )


@register(
    "q162_bm25_topk",
    f"""
    WITH t AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term,
               len(string_split_regex(trim(lower(text)), '\\s+')) AS dl
        FROM documents
    ),
    stats AS (
        SELECT COUNT(*) AS n,
               AVG(len(string_split_regex(trim(lower(text)), '\\s+')))
                   AS avgdl
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf, ANY_VALUE(dl) AS dl
        FROM t
        WHERE term IN ('spark', 'shuffle', 'partition')
        GROUP BY doc_id, term
    ),
    idf AS (
        SELECT term,
               ln((s.n - COUNT(DISTINCT doc_id) + 0.5)
                  / (COUNT(DISTINCT doc_id) + 0.5) + 1.0) AS idf
        FROM tf, stats s GROUP BY term, s.n
    )
    SELECT tf.doc_id,
           ROUND(SUM(idf.idf * tf.tf * ({BM25_K1} + 1.0)
                     / (tf.tf + {BM25_K1}
                        * (1.0 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl)))
                 + 1e-9, 6) AS bm25
    FROM tf JOIN idf USING (term), stats s
    GROUP BY tf.doc_id
    ORDER BY bm25 DESC, tf.doc_id LIMIT {BM25_TOPK}
    """,
    doc=(
        "BM25 top-k lexical retrieval (Okapi k1=1.2, b=0.75) for a fixed "
        "3-term query over the documents corpus — the relevance scorer "
        "data-selection pipelines run to pull topic-relevant training "
        "subsets.  Scale shape: exactly TWO corpus passes — one tokenize+"
        "explode pass cut to the query terms BEFORE any shuffle (so the "
        "per-(doc, term) aggregate sees |terms| * matching-docs rows, "
        "never the corpus vocabulary), and one doc-length pass for "
        "(N, avgdl); the tf table is persisted so the df/idf branch and "
        "the scoring branch share ONE evaluation instead of re-running "
        "the explode (the lazy two-branch form re-scanned the corpus 4x "
        "— caught by plan inspection).  idf and corpus stats broadcast "
        "back; the final top-k is a TakeOrderedAndProject (no global "
        "sort).  Ranking uses the ROUNDED score with a doc_id tie-break "
        "so the cut line is reproducible across engines."
    ),
)
def q162(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctum_spark.operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(
        docs, BM25_TERMS, k=BM25_TOPK, k1=BM25_K1, b=BM25_B, round_to=6
    )


K_ANON = 5  # minimum equivalence-class size for release
VALUE_BAND = 50.0  # generalization width for the numeric quasi-identifier


@register(
    "q163_k_anonymity",
    f"""
    SELECT event_type,
           EXTRACT(hour FROM ts) AS hour,
           CAST(FLOOR(value / {VALUE_BAND}) AS BIGINT) AS value_band,
           COUNT(*) AS class_size,
           COUNT(*) >= {K_ANON} AS released
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc=(
        "k-anonymity release gate (k=5): group the events table by its "
        "quasi-identifier tuple (event_type, hour-of-day, value "
        "generalized to width-50 bands) and mark every equivalence "
        "class smaller than k as SUPPRESSED — the standard "
        "privacy-preserving pre-release check a training-data pipeline "
        "runs before publishing event-derived features (small classes "
        "re-identify individuals; PII scrubbing (q123) removes direct "
        "identifiers, this bounds indirect ones).  Scale shape: ONE "
        "map-side-combined count at quasi-identifier grain — output "
        "rows are bounded by the QI domain (types x 24 x bands), never "
        "corpus-sized; suppression is a post-aggregate filter, zero "
        "joins.  Too-high suppression rates are fixed by WIDENING the "
        "generalization (larger VALUE_BAND, coarser time grain) and "
        "re-running the same one-pass check."
    ),
)
def q163(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.hour("ts").alias("hour"),
            F.floor(F.col("value") / VALUE_BAND).alias("value_band"),
        )
        .agg(F.count(F.lit(1)).alias("class_size"))
        .select(
            "event_type",
            "hour",
            "value_band",
            "class_size",
            (F.col("class_size") >= K_ANON).alias("released"),
        )
    )


L_DIVERSE = 3  # minimum distinct individuals per released class


@register(
    "q164_l_diversity",
    f"""
    SELECT event_type,
           EXTRACT(hour FROM ts) AS hour,
           CAST(FLOOR(value / {VALUE_BAND}) AS BIGINT) AS value_band,
           COUNT(*) AS class_size,
           COUNT(DISTINCT user_id) AS n_individuals,
           (COUNT(*) >= {K_ANON} AND COUNT(DISTINCT user_id) >= {L_DIVERSE})
               AS released
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc=(
        "distinct-individuals release gate (k=5, l=3): the companion to "
        "q163's k-anonymity.  A class can be large enough yet still "
        "re-identify when (nearly) all its rows belong to ONE person — "
        "a 5-row class made of a single user's events is that user.  "
        "Each quasi-identifier class must carry at least l distinct "
        "user_ids AND k rows to be released.  Precision note: because "
        "user_id is an IDENTIFIER, not a sensitive attribute, this is "
        "an individual-count floor per equivalence class (the k-map-"
        "style guarantee), not classic l-diversity over a sensitive "
        "value — the algebra (per-class COUNT DISTINCT threshold) is "
        "identical, so swapping in a true sensitive column is a "
        "one-argument change.  Scale shape: identical to q163 plus one "
        "COUNT(DISTINCT) expand at QI grain — still one corpus pass, "
        "zero joins, QI-domain-bounded output; at 100 TB the exact "
        "distinct swaps for approx_count_distinct with identical "
        "algebra (q98 is the sketch-accuracy harness)."
    ),
)
def q164(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.hour("ts").alias("hour"),
            F.floor(F.col("value") / VALUE_BAND).alias("value_band"),
        )
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct("user_id").alias("n_individuals"),
        )
        .select(
            "event_type",
            "hour",
            "value_band",
            "class_size",
            "n_individuals",
            (
                (F.col("class_size") >= K_ANON)
                & (F.col("n_individuals") >= L_DIVERSE)
            ).alias("released"),
        )
    )
