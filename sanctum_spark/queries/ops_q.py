"""Operator-library queries: near-dup dedup, ANN similarity, text
profiling, multimodal plumbing.

Oracle-checkable ones carry SQL; pipelines built on xxhash64/LSH are
engine-specific and registered rows-only (the driver records the weaker
check; determinism is asserted in tests/test_operators.py instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sanctum_spark.io import load_table, parquet_split_count, spread_scan
from sanctum_spark.operators import dedup as D
from sanctum_spark.operators import multimodal as M
from sanctum_spark.operators import similarity as S
from sanctum_spark.operators import text as TX
from sanctum_spark.queries import register


@register(
    "q74_minhash_lsh_pairs",
    None,
    doc=(
        "MinHash-LSH near-duplicate pairs over documents (16 hashes, 4 "
        "bands, 3-shingles, exact-Jaccard-verified ≥0.5). xxhash64-based — "
        "rows-only for the driver; determinism + planted-duplicate recall "
        "asserted in tests/test_operators.py."
    ),
)
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread_scan(
        load_table(spark, sf_dir, "documents"),
        parquet_split_count(sf_dir, "documents"),
    )
    return D.minhash_near_duplicates(
        docs, "text", "doc_id", n_hashes=16, bands=4, shingle_k=3, threshold=0.5
    ).orderBy("id_a", "id_b")


@register(
    "q75_simhash_pairs",
    None,
    doc=(
        "SimHash near-dup pairs (64-bit fingerprints, 16-bit-chunk "
        "pigeonhole blocking, Hamming ≤ 3). Rows-only: xxhash64-based."
    ),
)
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread_scan (r14, guide §2.5): the SimHash 64-bit vote fold — the
    # expensive per-row work — runs fused into the single-row-group scan
    # and was serializing on one core behind the eager fingerprint
    # persist (the q74/q81/q90 mechanism; this query was missed by the
    # r13 sweep).  Per-row deterministic, so partitioning cannot change
    # results.  Paired A/B (6 pairs, one JVM): median ratio 0.44
    # (1.9 s -> 0.8 s), output identical.
    docs = spread_scan(
        load_table(spark, sf_dir, "documents"),
        parquet_split_count(sf_dir, "documents"),
    )
    return D.simhash_near_duplicates(docs, "text", "doc_id", max_hamming=3).orderBy(
        "id_a", "id_b"
    )


@register(
    "q76_quality_profile",
    """
    WITH t AS (
        SELECT doc_id,
               text,
               str_split_regex(trim(text), '\\s+')                       AS toks,
               LENGTH(text)                                              AS n_chars,
               LENGTH(text) - LENGTH(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                                                                         AS n_punct
        FROM documents
    ), m AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               len(list_filter(str_split_regex(lower(text), '\\s+'),
                   t -> list_contains(['the','and','of','to','is','in','that','it'], t)))
                   * 1.0 / GREATEST(len(str_split_regex(lower(text), '\\s+')), 1)
                                                                         AS sw_ratio,
               n_punct * 1.0 / GREATEST(n_chars, 1)                      AS p_ratio,
               LENGTH(regexp_replace(text, '\\s+', '', 'g')) * 1.0
                   / GREATEST(len(toks), 1)                              AS mean_wlen,
               n_chars
        FROM t
    )
    SELECT doc_id, n_tokens,
           ROUND(sw_ratio + 1e-9, 6) AS stopword_ratio,
           ROUND(p_ratio + 1e-9, 6)  AS punct_ratio,
           ROUND(0.4 * LEAST(n_chars / 500.0, 1.0)
                 + 0.3 * (CASE WHEN mean_wlen >= 3.0 AND mean_wlen <= 10.0
                               THEN 1.0 ELSE 0.5 END)
                 + 0.3 * (1.0 - LEAST(p_ratio * 5.0, 1.0)) + 1e-9, 6) AS quality
    FROM m
    """,
    doc="deterministic text quality scoring (length/word-length/punct bands).",
)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    from sanctum_spark.queries.util import stable_round

    c = F.col("text")
    return docs.select(
        "doc_id",
        TX.token_count(c).alias("n_tokens"),
        stable_round(TX.stopword_ratio(c), 6).alias("stopword_ratio"),
        stable_round(TX.punct_ratio(c), 6).alias("punct_ratio"),
        stable_round(TX.quality_score(c), 6).alias("quality"),
    )


@register(
    "q77_text_profile",
    r"""
    WITH t AS (
        SELECT doc_id, text,
               regexp_split_to_array(trim(text), '\s+') AS toks,
               regexp_split_to_array(trim(lower(text)), '\s+') AS ltoks
        FROM documents
    ),
    s AS (
        SELECT doc_id, text, toks, ltoks,
               len(list_filter(ltoks, t -> list_contains(
                   ['the','and','of','to','is','in','that','it'], t))) AS s_en,
               len(list_filter(ltoks, t -> list_contains(
                   ['der','die','das','und','ist','nicht','ein','zu'], t))) AS s_de,
               len(list_filter(ltoks, t -> list_contains(
                   ['el','la','los','las','es','y','que','un'], t))) AS s_es,
               len(list_filter(ltoks, t -> list_contains(
                   ['le','la','les','est','et','que','un','une'], t))) AS s_fr,
               (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
                 / CAST(greatest(length(text), 1) AS DOUBLE) AS praw,
               length(regexp_replace(text, '\s+', '', 'g'))
                 / CAST(greatest(len(toks), 1) AS DOUBLE) AS mw
        FROM t
    )
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]')) AS BIGINT) AS n_bpe_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique_tokens,
           -- argmax(score, lang) with Spark's struct-max tie-break:
           -- highest score, ties to the lexicographically GREATEST lang
           -- NULL text scores no language: every s_* is NULL and the
           -- comparisons fall through to ELSE 'de' — pin 'und' explicitly
           -- (Spark's profile already yields 'und'; r6 null-row sweep)
           CASE WHEN text IS NULL THEN 'und'
                WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
                WHEN s_fr = greatest(s_en, s_de, s_es, s_fr) THEN 'fr'
                WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
                WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
                ELSE 'de' END AS lang_pred,
           ROUND(s_en / CAST(greatest(len(ltoks), 1) AS DOUBLE), 6) AS stopword_ratio,
           ROUND(praw, 6) AS punct_ratio,
           ROUND(0.4 * least(length(text) / 500.0, 1.0)
               + 0.3 * (CASE WHEN mw >= 3.0 AND mw <= 10.0 THEN 1.0 ELSE 0.5 END)
               + 0.3 * (1.0 - least(praw * 5.0, 1.0)), 6) AS quality,
           -- NULL text: NULL fingerprint (list_prepend('', NULL) would
           -- fold to '' and diverge from Spark's NULL; r6 null-row sweep)
           CASE WHEN text IS NULL THEN NULL
                ELSE list_reduce(list_prepend('', ltoks),
                                 (acc, tk) -> md5(acc || tk)) END
               AS fingerprint
    FROM s
    """,
    doc=(
        "full one-pass corpus profile (adds lang-ID + rolling fingerprint "
        "+ BPE-ish token count). Fully oracle-paired: the fingerprint is "
        "the engine-portable chained-md5 rolling hash "
        "(doc_fingerprint_md5), so every column — including the argmax "
        "lang-ID and the order-sensitive fingerprint fold — is "
        "hash-checked against DuckDB."
    ),
)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TX.text_profile(docs, portable_fingerprint=True).orderBy("doc_id")


@register(
    "q78_ann_lsh_topk",
    None,
    doc=(
        "LSH-bucketed ANN cosine top-10 for the vec_id=0 query (6 planes / "
        "64 buckets, 8 probes — bucket count sized so occupancy stays "
        "useful from sf0.001 up; at real scale raise n_planes with corpus "
        "size). Rows-only; soundness vs the exact q73 baseline asserted in "
        "tests/test_operators.py."
    ),
)
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    if qrow is None:
        if not emb.isEmpty():  # data bug, not an empty ingest: fail loud
            raise ValueError("q78: query vector vec_id=0 missing")
        return spark.createDataFrame([], "vec_id bigint, cos_sim double")
    qvec = [float(x) for x in qrow[0]]
    lsh = S.RandomHyperplaneLSH(dim=len(qvec), n_planes=6, seed=42)
    bucketized = lsh.bucketize(emb.filter(F.col("vec_id") != 0))
    return lsh.topk(bucketized, qvec, k=10, n_probes=8)


@register(
    "q90_multimodal_features",
    """
    SELECT doc_id AS media_id,
           'image' AS modality,
           -- encode(), not ::BLOB: the cast ERRORS on non-ASCII text
           -- while encode() is the UTF-8 byte conversion Spark's
           -- encode(text,'utf-8') performs (r6 unicode sweep)
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           ROUND(CAST(
               (list_sum(list_transform(range(0, 16),
                   i -> ('0x' || substr(md5(text || 'R'), 2*i+1, 2))::INT))
                / 16.0) / 255.0
           AS REAL)::DOUBLE + 1e-9, 6) AS f0
    FROM documents
    WHERE text IS NOT NULL
    """,
    doc=(
        "multimodal plumbing: documents' bytes as opaque binary payloads → "
        "MEDIA_SCHEMA envelope → mapInPandas feature extraction (real "
        "Arrow batch shape; md5-tile fake decoder). Fully oracle-paired: "
        "the fake tensor's R-channel mean is exactly mean(md5(payload||"
        "'R') bytes), double-rounded through float32 the same way on both "
        "engines, so the whole Python-kernel pipeline is hash-checked "
        "against DuckDB, not rows-only."
    ),
)
def q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sanctum_spark.queries.util import stable_round

    # a NULL payload has no bytes/features: both engines skip it (also
    # keeps n_bytes int64 — one NULL row would flip the oracle's pandas
    # dtype to float64 and break the string hash for EVERY row)
    #
    # spread_scan (r14, guide §2.5/§4.3): the Arrow mapInPandas decode
    # below otherwise runs as ONE Python worker behind the single-row-
    # group scan — the q81 mechanism.  r13's sweep read q90 as a loser
    # (1.36) in its window; the r14 interleaved paired A/B (8 pairs, one
    # JVM) measures median ratio 0.56 (0.88-1.24 s -> 0.53-0.69 s), and
    # per-row md5 features are partitioning-independent by construction.
    docs = (
        spread_scan(
            load_table(spark, sf_dir, "documents"),
            parquet_split_count(sf_dir, "documents"),
        )
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.encode("text", "utf-8").alias("blob"))
    )
    media = M.attach_media_columns(docs, "blob", "image", "doc_id")
    feats = M.extract_features(media, fake_decode=True)
    return feats.select(
        "media_id",
        "modality",
        "n_bytes",
        stable_round(F.element_at("feature", 1).cast("double"), 6).alias("f0"),
    ).orderBy("media_id")
