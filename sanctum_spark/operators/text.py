"""Text-analysis operators for training-data pipelines.

All hot paths are JVM built-ins (split/regexp/length/aggregate); nothing
here drops to Python except ``compression_ratio`` (no SQL zlib exists),
so these compose with scans at full codegen speed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword anchors for the n-gram/stopword heuristic.
# (public common-word lists; intentionally minimal — the operator contract
# is determinism, not linguistic accuracy)
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "es": ["el", "la", "los", "las", "es", "y", "que", "un"],
    "fr": ["le", "la", "les", "est", "et", "que", "un", "une"],
}

BPE_ISH_TOKEN_RE = r"[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]"


def tokens(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: str | Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col)).cast("long")


def bpe_ish_token_count(col: str | Column) -> Column:
    """Sub-word-ish token count: alpha runs + short digit runs + single
    punctuation, via one regexp extraction (roughly tracks BPE inflation
    on ASCII text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_TOKEN_RE), 0)).cast("long")


def stopword_ratio(col: str | Column, lang: str = "en") -> Column:
    toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    markers = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
    return hits / F.greatest(F.size(toks), F.lit(1)).cast("double")


def punct_ratio(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return n_punct / F.greatest(F.length(c), F.lit(1)).cast("double")


def lang_id(col: str | Column) -> Column:
    """Heuristic language ID: argmax over per-language stopword hit counts;
    'und' (undetermined) when nothing matches."""
    toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    scored = []
    for lang, words in _LANG_MARKERS.items():
        markers = F.array(*[F.lit(w) for w in words])
        score = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
        scored.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scored))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(col: str | Column, lang: str = "en") -> Column:
    """Composite quality score in [0,1]: length saturation + mean-word-length
    band + low punctuation density.  Deterministic, SQL-expressible."""
    c = F.col(col) if isinstance(col, str) else col
    length_part = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    toks = tokens(c)
    mean_wlen = F.length(F.regexp_replace(c, r"\s+", "")) / F.greatest(
        F.size(toks), F.lit(1)
    ).cast("double")
    wlen_part = F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), 1.0).otherwise(0.5)
    punct_part = F.lit(1.0) - F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    return (0.4 * length_part + 0.3 * wlen_part + 0.3 * punct_part).cast("double")


def compression_ratio(col: str | Column, level: int = 6) -> Column:
    """zlib compressed-size / raw-size per text — the classic
    repetition/boilerplate quality signal (templated text compresses far
    below natural prose; Gopher-family pipelines threshold on it).

    Arrow-batched scalar pandas UDF over stdlib zlib: deterministic for
    a given zlib build, embarrassingly parallel, no shuffle.  Python is
    unavoidable here (no SQL/Catalyst zlib), so this is one of the few
    sanctioned non-JVM text signals; everything else in this module
    stays expression-side.
    """
    import zlib

    lvl = int(level)

    @F.pandas_udf("double")
    def _ratio(texts: pd.Series) -> pd.Series:
        def one(t) -> float:
            raw = str(t).encode("utf-8")
            if not raw:
                return 1.0
            return len(zlib.compress(raw, lvl)) / len(raw)

        return texts.map(one)

    c = F.col(col) if isinstance(col, str) else col
    return _ratio(c)


def doc_fingerprint(col: str | Column) -> Column:
    """Order-sensitive 64-bit document fingerprint: fold xxhash64 over the
    token stream (a distributed analog of a rolling content hash — stable
    under reformatting of whitespace but not under reordering)."""
    toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.xxhash64(acc.cast("string"), t),
    )


def doc_fingerprint_md5(col: str | Column) -> Column:
    """Engine-portable rolling fingerprint: chained md5 over the token
    stream (acc = md5(acc || token)).  Same order-sensitive /
    whitespace-stable semantics as ``doc_fingerprint`` but expressible in
    ANSI-ish SQL (DuckDB: list_reduce + md5), so profile queries built on
    it are fully oracle-checkable.  The xxhash64 variant stays the fast
    path (no 32-hex-char string per step); use this one where
    cross-engine verifiability matters more than the last ~ns/token."""
    toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    return F.aggregate(
        toks,
        F.lit(""),
        lambda acc, t: F.md5(F.concat(acc, t)),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.05,
) -> DataFrame:
    """Benchmark decontamination: flag training documents whose word-k-gram
    containment against a benchmark suite reaches ``threshold``.

    Returns (id, n_overlap, containment) where containment = |doc shingles
    ∩ benchmark shingles| / |doc shingles|.  The standard pre-training
    hygiene step: any doc carrying a meaningful fraction of an eval set's
    n-grams is dropped before training.

    Scale shape: benchmark suites are tiny relative to a 100 TB corpus, so
    the distinct benchmark-shingle set is collected ONCE and broadcast —
    the corpus side is a scan + broadcast-hash semi-join (no corpus
    shuffle); the only shuffle is the groupBy(id) over MATCHED shingle
    rows, bounded by actual overlap, not corpus size.
    """
    from sanctum_spark.operators.dedup import shingle_tokens

    doc_sh = docs.select(
        F.col(id_col),
        shingle_tokens(text_col, k).alias("shingles"),
    ).select(
        id_col,
        F.size("shingles").cast("long").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    )
    bench_sh = benchmark.select(
        F.explode(shingle_tokens(text_col, k)).alias("shingle")
    ).distinct()
    containment = F.col("n_overlap") / F.col("n_sh").cast("double")
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.max("n_sh").alias("n_sh"), F.count(F.lit(1)).alias("n_overlap"))
        .filter(containment >= threshold)
        .select(id_col, "n_overlap", containment.alias("containment"))
    )


def repetition_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style intra-document repetition metrics, zero-shuffle.

    Per doc: token count, duplicate-token fraction, top-token (mode)
    frequency fraction, and duplicate-bigram fraction — the signals the
    Gopher/C4 quality rules threshold on.  Everything is a per-row JVM
    expression (split / array_distinct / sort + run-length fold / bigram
    transform): embarrassingly parallel, no shuffle, composes with the
    scan at codegen speed — the explode+groupBy alternative would shuffle
    every token of the corpus.

    The token array is _let-bound (see dedup._let) so Catalyst evaluates
    the split once per referenced metric instead of once per element;
    the 4 struct-field references re-evaluate the O(tokens) metric
    expression 4x, which is accepted (cheap) in exchange for staying
    entirely shuffle-free.
    """
    from sanctum_spark.operators.dedup import _let

    # NULL text has no repetition profile on either engine (r6 null-row
    # sweep; the oracle drops these docs via WHERE text IS NOT NULL)
    df = df.filter(F.col(text_col).isNotNull())
    c = F.col(text_col)

    def metrics(toks: Column) -> Column:
        n = F.size(toks)
        nd = F.greatest(n, F.lit(1)).cast("double")
        nb = F.greatest(n - 1, F.lit(1))
        bigrams = F.transform(
            F.sequence(F.lit(1), nb),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        )
        # mode frequency: run-length fold over the sorted array — no
        # explode, no shuffle; `run` is referenced twice (O(2n), not O(n²))
        acc0 = F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        )

        def step(acc: Column, t: Column) -> Column:
            run = F.when(t == acc["prev"], acc["run"] + 1).otherwise(
                F.lit(1).cast("long")
            )
            return F.struct(
                t.alias("prev"),
                run.alias("run"),
                F.greatest(acc["best"], run).alias("best"),
            )

        top = F.aggregate(F.array_sort(toks), acc0, step, lambda a: a["best"])
        return F.struct(
            n.cast("long").alias("n_tokens"),
            (F.lit(1.0) - F.size(F.array_distinct(toks)) / nd).alias(
                "dup_token_frac"
            ),
            (top / nd).alias("top_token_frac"),
            (
                F.lit(1.0)
                - F.size(F.array_distinct(bigrams)) / nb.cast("double")
            ).alias("dup_bigram_frac"),
        )

    m = _let(F.split(F.lower(F.trim(c)), r"\s+"), metrics)
    return df.select(
        F.col(id_col),
        m["n_tokens"].alias("n_tokens"),
        m["dup_token_frac"].alias("dup_token_frac"),
        m["top_token_frac"].alias("top_token_frac"),
        m["dup_bigram_frac"].alias("dup_bigram_frac"),
    )


def text_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable_fingerprint: bool = False,
) -> DataFrame:
    """One-pass per-document profile used by corpus-curation pipelines.

    ``portable_fingerprint`` swaps the xxhash64 rolling fingerprint for
    the chained-md5 one (``doc_fingerprint_md5``) — identical semantics,
    engine-portable, so the whole profile row can be oracle-verified."""
    c = F.col(text_col)
    fp = doc_fingerprint_md5(c) if portable_fingerprint else doc_fingerprint(c)
    return df.select(
        F.col(id_col),
        F.length(c).cast("long").alias("n_chars"),
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_bpe_tokens"),
        F.size(F.array_distinct(tokens(c))).cast("long").alias("n_unique_tokens"),
        lang_id(c).alias("lang_pred"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(quality_score(c), 6).alias("quality"),
        fp.alias("fingerprint"),
    )


def char_ngrams(col: str | Column, n: int = 3) -> Column:
    """Character n-grams of the lowercased text as an array<string>;
    texts shorter than n (and NULL text) yield an empty array.

    The lowercased string is _let-BOUND: the transform lambda substrings
    it once per gram, and unbound Catalyst inlines the lower() into
    every gram (no lambda CSE) — O(len²) character copying per document.
    The short-string guard is branch-free (``sequence(1, len-n+1)``
    would DESCEND for len < n, so the null-propagating floor + slice
    pattern from hashed_word_windows applies); the previous when()
    branch was additionally excluded from codegen subexpression
    elimination (r7 shingle finding)."""
    from sanctum_spark.operators.dedup import _let

    raw = F.col(col) if isinstance(col, str) else col

    def body(s: Column) -> Column:
        m = F.length(s) - F.lit(n - 1)
        floor1 = F.length(s) * 0 + 1
        full = F.transform(
            F.sequence(F.lit(1), F.greatest(m, floor1)),
            lambda i: s.substr(i, F.lit(n)),
        )
        return F.slice(full, 1, F.greatest(m, F.length(s) * 0))

    return F.coalesce(
        _let(F.lower(raw), body), F.array().cast("array<string>")
    )


def ngram_lm_table(train: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Character-n-gram language-model count table: (gram, cnt).

    The key space is bounded by charset^n (not corpus size), so the
    groupBy's partial aggregation does almost all the work map-side and
    the shuffle ships at most |vocab| rows per partition — this is the
    KenLM-style count pass, scaled down to characters so it stays exact
    and engine-portable."""
    return (
        train.select(F.explode(char_ngrams(text_col, n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ngram_lm_score(
    docs: DataFrame,
    table: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    alpha: float = 0.5,
) -> DataFrame:
    """Perplexity-proxy quality score: mean log-probability of each doc's
    character n-grams under the unigram-of-n-grams model in ``table``,
    with additive (add-alpha) smoothing for unseen grams.

    Scale shape: the count table is vocabulary-bounded → broadcast; the
    corpus side pre-aggregates to (id, gram, in-doc count) BEFORE the
    join, so repeated grams within a document probe the broadcast table
    once, not once per instance (A/B at sf0.1 warm: 3.5 s vs 4.2 s; the
    repetition factor — and the win — grows with document length).  The
    score is then the count-weighted mean log-prob, algebraically equal
    to avg-over-instances.  One groupBy(id) finishes with a (sum, n)
    payload — the canonical model-based quality-filter pass (CCNet/KenLM
    shape) without leaving the JVM.
    Returns (id, n_grams, lm_logp) with lm_logp = avg ln p(gram).
    """
    totals = table.agg(
        F.sum("cnt").cast("double").alias("_total"),
        F.count(F.lit(1)).cast("double").alias("_vocab"),
    )
    grams = (
        docs.select(
            F.col(id_col), F.explode(char_ngrams(text_col, n)).alias("gram")
        )
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    logp = F.log(
        (F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + F.lit(alpha))
        / (F.col("_total") + F.lit(alpha) * F.col("_vocab"))
    )
    return (
        grams.join(F.broadcast(table), "gram", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_grams"),
            (F.sum(F.col("_c") * logp) / F.sum("_c")).alias("lm_logp"),
        )
    )


# deterministic PII surface: patterns are RE2- and Java-regex-compatible so
# the scrub is reproducible in both Spark and the DuckDB oracle.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ip": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+\d[\d\-]{6,}\d", "<PHONE>"),
}


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII redaction pass: replace emails, IPv4 addresses and +intl phone
    numbers with typed placeholders and count each class per document.

    Order is fixed (email → ip → phone) so overlapping matches resolve
    identically everywhere; counts are taken on the ORIGINAL text. Pure
    per-row regexp work — no shuffle, composes with the scan."""
    c = F.col(text_col)
    counts = {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), 0)).cast("long")
        for name, (pat, _) in PII_PATTERNS.items()
    }
    clean = c
    for name in ("email", "ip", "phone"):
        pat, repl = PII_PATTERNS[name]
        clean = F.regexp_replace(clean, pat, repl)
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        counts["email"].alias("n_email"),
        counts["ip"].alias("n_ip"),
        counts["phone"].alias("n_phone"),
    )


def quality_logit_score(col: str | Column, lang: str = "en") -> Column:
    """Linear quality-classifier inference as a pure JVM expression: a
    logistic model over the standard text-quality features (token count
    saturation, stopword ratio, punctuation density, mean word length).

    The weights are compiled into the scan — classifier inference over
    100 TB is then a zero-shuffle projection, the fastText-scorer shape
    without leaving codegen. Deterministic and SQL-expressible."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_tokens = F.size(toks).cast("double")
    x_len = F.least(n_tokens / F.lit(400.0), F.lit(1.0))
    x_sw = stopword_ratio(c, lang)
    x_punct = punct_ratio(c)
    mean_wlen = F.length(F.regexp_replace(c, r"\s+", "")) / F.greatest(
        F.size(toks), F.lit(1)
    ).cast("double")
    x_wlen = F.least(mean_wlen / F.lit(10.0), F.lit(1.0))
    z = (
        F.lit(-1.0)
        + F.lit(2.2) * x_len
        + F.lit(1.5) * x_sw
        - F.lit(3.0) * x_punct
        + F.lit(0.8) * x_wlen
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def cooccurrence_pairs(docs: DataFrame, text_col: str = "text", window: int = 2) -> DataFrame:
    """Ordered skip-gram co-occurrence pairs ``(w1, w2)`` within a forward
    window — one row per occurrence (count them to get the word2vec/GloVe
    count table, as q109/q114 do).

    Pairs are built by ``zip_with`` over two array slices per offset (no
    index arithmetic, no OOB risk under ANSI mode) and exploded; the pair
    key space is bounded by vocab**2 regardless of corpus size, so any
    downstream aggregate — not the explode — is the only exchange.

    The lowered token array is _let-BOUND: it is referenced 2+4·window
    times inside the concat-of-zip_withs, and the Generate input gets no
    subexpression elimination, so unbound it re-tokenized the document
    per reference (r7 audit; measured 0.92 -> 0.46 s for the pair stage
    at sf0.1, identical output).
    """
    from sanctum_spark.operators.dedup import _let

    def body(t: Column) -> Column:
        n = F.size(t)

        def pairs_at(off: int) -> Column:
            ln = F.greatest(n - off, F.lit(0))
            return F.zip_with(
                F.slice(t, 1, ln),
                F.slice(t, 1 + off, ln),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )

        return F.concat(*[pairs_at(o) for o in range(1, window + 1)])

    allp = _let(F.transform(tokens(F.col(text_col)), lambda w: F.lower(w)), body)
    return docs.select(F.explode(allp).alias("pr")).select("pr.w1", "pr.w2")
