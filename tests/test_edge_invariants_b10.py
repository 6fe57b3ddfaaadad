"""Cross-engine invariants, batch 10: Unicode text through the corpus
family (r6 unicode sweep, tools/unicode_sweep.py).  CJK without spaces,
emoji with ZWJ sequences, combining marks, NBSP / ideographic space,
and RTL Arabic must flow through tokenization, hashing, profiling and
the multimodal byte path IDENTICALLY on both engines; the two known
engine-library divergences (JVM full case mapping vs utf8proc simple
folding on U+0130 'İ', and code-point vs BYTE levenshtein) are pinned
from both sides so a silent change in either library is caught.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from test_edge_invariants import _both_tbl, _write_docs

CJK = "漢字テキストに空白なし"
EMOJI = "emoji 👨‍👩‍👧‍👦 text 🎉 done"
ACCENT = "café résumé naive"
NBSP = "nbsp bound tokens"
WIDE = "wide　ideographic　space"
ARABIC = "نص عربي من اليمين إلى اليسار"


def _uni_docs(tmp_path):
    texts = [CJK, EMOJI, ACCENT, NBSP, WIDE, ARABIC]
    rows = [
        (i + 1, t, "xx", "uni", len(t)) for i, t in enumerate(texts)
    ]
    return _write_docs(tmp_path, rows)


def test_q90_unicode_byte_counts(spark, tmp_path):
    """Multimodal byte path on non-ASCII payloads: the oracle's
    text::BLOB cast ERRORED on any non-ASCII character — encode() is
    the UTF-8 conversion Spark performs, and n_bytes now pins the
    UTF-8 byte length (CJK chars are 3 bytes, the ZWJ family 25)."""
    sf = _uni_docs(tmp_path)
    got, want = _both_tbl(spark, sf, "q90_multimodal_features", "documents")
    pd.testing.assert_frame_equal(got, want)
    n_bytes = dict(zip(got["media_id"], got["n_bytes"]))
    assert n_bytes["1"] == str(len(CJK.encode()))
    assert n_bytes["2"] == str(len(EMOJI.encode()))


def test_unicode_through_text_family(spark, tmp_path):
    """Tokenization / hashing / profiling on Unicode: CJK without
    spaces is ONE token, NBSP and ideographic space are NOT separators
    (ASCII-\\s semantics in both regex engines), ZWJ emoji survive
    md5-fingerprinting — q77/q92/q106/q110/q122 all stay driver-equal."""
    sf = _uni_docs(tmp_path)
    for name in ("q77_text_profile", "q92_corpus_clean", "q106_tfidf_terms",
                 "q110_context_chunks", "q122_lm_score"):
        got, want = _both_tbl(spark, sf, name, "documents")
        pd.testing.assert_frame_equal(got, want, obj=name)
    got, _ = _both_tbl(spark, sf, "q77_text_profile", "documents")
    n_tokens = dict(zip(got["doc_id"], got["n_tokens"]))
    assert n_tokens["1"] == "1"  # CJK: no ASCII whitespace -> one token
    assert n_tokens["4"] == "1"  # NBSP is not a \s separator
    assert n_tokens["5"] == "1"  # U+3000 is not a \s separator either
    assert n_tokens["6"] == "6"  # Arabic words split on plain spaces


def test_documented_case_and_levenshtein_divergences(spark):
    """The two engine-library divergences the unicode sweep attributes
    everything else to — pinned from BOTH sides (the q30-style
    discipline):

    - lower('İ'): the JVM's full case mapping emits i + COMBINING DOT
      ABOVE (2 code points) while DuckDB's utf8proc simple folding
      emits a bare 'i' — so lower()-derived tokens/fingerprints diverge
      on text containing U+0130 (and only then);
    - levenshtein: Spark counts code points (the intended semantics,
      used by q115/q161), DuckDB counts BYTES — 'café' vs 'cafe' is
      distance 1 in Spark and 2 in DuckDB (é is 2 bytes)."""
    row = (
        spark.createDataFrame([("İstanbul", "café")], ["a", "b"])
        .select(
            F.lower("a").alias("low"),
            F.levenshtein(F.col("b"), F.lit("cafe")).alias("lev"),
            F.length(F.lower("a")).alias("low_len"),
        )
        .collect()[0]
    )
    assert row["low"] == "i̇stanbul" and row["low_len"] == 9
    assert row["lev"] == 1
    duck = duckdb.sql(
        "SELECT lower('İstanbul') AS low, levenshtein('café', 'cafe') AS lev"
    ).fetchone()
    assert duck == ("istanbul", 2)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
