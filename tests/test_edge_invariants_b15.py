"""Cross-engine invariants, batch 15: least()/greatest() null-skip vs
the null-propagation guard pattern (found by the r8 fuzz sweep).

Spark's ``least``/``greatest`` return the least/greatest NON-NULL
argument — they SKIP nulls instead of propagating them.  The
branch-free short-input guards in this repo (shingle_tokens,
char_ngrams, hashed_word_windows) rely on NULL input PROPAGATING
through the window-count arithmetic so the final coalesce turns it
into an empty array.  ``hashed_word_windows``'s cap clamp broke that
chain: ``least(n, lit(cap))`` resurrected ``n = cap`` on NULL text, so
a NULL document emitted ``cap`` copies of ``xxhash64(NULL) = 42`` — a
phantom shingle shared by EVERY source containing one NULL doc, which
the fuzz sweep surfaced as a q142 containment-matrix divergence
(Spark 106 rows vs oracle 52 on the seed-1 fuzz schema).  The fix
anchors the cap null-propagatingly (``size(t)*0 + cap``).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hashed_word_windows_null_text_with_cap(spark):
    """NULL/empty/short text yields an EMPTY window array even when a
    cap is set (the null-skip trap fired only on the capped path)."""
    from sanctum_spark.operators.dedup import hashed_word_windows

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c"), (4, "a b c d e f")],
        ["id", "text"],
    )
    for cap in (None, 199, 1):
        rows = {
            r["id"]: r["w"]
            for r in df.select(
                "id", hashed_word_windows("text", k=5, cap=cap).alias("w")
            ).collect()
        }
        assert rows[1] == [], (cap, rows[1][:3])
        assert rows[2] == [] and rows[3] == []
        # 6 tokens, k=5 -> 2 windows; cap=1 clamps to the first
        assert len(rows[4]) == (2 if cap != 1 else 1) and 42 not in rows[4]


def test_q142_no_phantom_pair_from_null_docs(spark, tmp_path):
    """Two sources sharing NOTHING but a NULL doc each must produce an
    empty overlap matrix — the q142 shape of the phantom-shingle bug."""
    import sanctum_spark.queries as qreg

    qreg.load_all_modules()
    docs = spark.createDataFrame(
        [
            (1, None, "en", "sA", 0),
            (2, "alpha beta gamma delta epsilon zeta", "en", "sA", 36),
            (3, None, "en", "sB", 0),
            (4, "one two three four five six seven", "en", "sB", 33),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    out = qreg.REGISTRY["q142_cross_source_overlap"].fn(spark, sf).collect()
    assert out == [], [tuple(r) for r in out]
