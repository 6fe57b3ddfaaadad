"""Byte-pair-encoding vocabulary training and tokenization.

The LLM-tokenizer construction stage of a training-data pipeline: learn
a merge table from the corpus, then tokenize the corpus with it.

Scale shape (the same one Sennrich et al. 2016 / GPT-2 used): BPE does
NOT train on raw text — it trains on the **word-frequency table**, which
is vocabulary-bounded (Heaps' law: ~10^6-10^7 distinct words at any
corpus size) while the corpus is not.  So:

1. ``word_counts`` — one explode + map-side-combined count shuffle; the
   only corpus-sized pass, identical shape to q101/q109.
2. the top-``max_words`` (frequency desc, word asc — deterministic) rows
   collect to the driver: a bounded *parameter fit*, like ``pq_train``'s
   sample, not a data collect.
3. the classic merge loop runs driver-side over that table: each round
   counts adjacent symbol pairs weighted by word frequency and merges
   the most frequent pair (ties: lexicographic, so training is fully
   deterministic).
4. ``bpe_apply`` tokenizes the full corpus with the learned table as an
   Arrow-batched kernel — embarrassingly parallel, zero shuffle; the
   merge table ships in the UDF closure (KBs).

No external tokenizer libraries: pure Python + Spark built-ins.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker so merges can't cross word boundaries

# ONE word-segmentation convention for train AND apply.  Spark's split()
# uses Java regex where \s is ASCII-only; Python's str.split() splits on
# Unicode whitespace (NBSP etc.), so mixing the two segments text with
# exotic spaces differently at train vs apply time.  The apply kernel
# therefore uses the same ASCII-\s+ regex as the Spark side.
_WS_RE = re.compile(r"\s+", re.ASCII)


def _words(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) counts — the corpus-sized pass. One shuffle, map-side
    combined, output vocabulary-bounded."""
    return (
        df.select(F.explode(_words(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _merge_word(symbols: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == pair[0] and symbols[i + 1] == pair[1]:
            out.append(symbols[i] + symbols[i + 1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    max_words: int = 50_000,
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from the corpus.

    Deterministic: the word table is truncated by (freq desc, word asc),
    and each round's best pair breaks frequency ties lexicographically.
    Returns the merge list (driver-side parameter, ~KBs).
    """
    rows = (
        word_counts(df, text_col)
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        word, n = r["word"], r["n"]
        vocab[tuple(word) + (END,)] = n

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for symbols, n in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best_n = max(pairs.values())
        if best_n < min_freq:
            break
        pair = min(p for p, n in pairs.items() if n == best_n)
        merges.append(pair)
        vocab = {_merge_word(s, pair): n for s, n in vocab.items()}
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    symbols = list(word) + [END]
    while len(symbols) > 1:
        best_rank, best_i = None, None
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` into an ``array<string>`` of BPE symbols.

    Arrow-batched, zero shuffle; the merge-rank table ships in the
    closure.  A per-batch word→tokens memo exploits Zipf: each distinct
    word is encoded once per batch regardless of how often it repeats.
    """
    from pyspark.sql.types import ArrayType, StringType

    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc(text) -> list[str]:
            out: list[str] = []
            for w in _WS_RE.split(str(text).lower()):
                if not w:
                    continue
                toks = memo.get(w)
                if toks is None:
                    toks = _encode_word(w, ranks)
                    memo[w] = toks
                out.extend(toks)
            return out

        return texts.map(enc)

    return df.withColumn(out_col, encode(F.col(text_col)))
