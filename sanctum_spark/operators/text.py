"""Text-analysis operators for training-data pipelines.

All hot paths are JVM built-ins (split/regexp/length/aggregate); nothing
here drops to Python, so these compose with scans at full codegen speed.
"""

from __future__ import annotations

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


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass per-document profile used by corpus-curation pipelines."""
    c = F.col(text_col)
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
        doc_fingerprint(c).alias("fingerprint"),
    )
