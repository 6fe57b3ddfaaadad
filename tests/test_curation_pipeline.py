"""Fused curation pipeline (clean → near-dup → decontaminate → pack).

r10 verdict task #4: SCALE.md measures the curation operators
individually, but a real 100 TB run chains them as ONE job with a shared
scan.  These tests pin (1) that the FUSED chain's output equals
STAGE-AT-A-TIME execution with parquet materialization between stages —
the equivalence that makes the fused plan's shared-scan savings a free
choice rather than a semantics change — and (2) each stage's effect on a
planted corpus where every drop is forced by construction.

Determinism note: every stage is deterministic (struct-min exact dedup,
min-label CC over MinHash edges whose banding is xxhash64-seeded, exact
containment, integer prefix sums), so full-output equality is
well-defined.  The near-dup cluster is planted as case-variants of one
text: md5 digests differ (exact dedup keeps all), but shingling
lowercases, so the shingle sets — and therefore the MinHash signatures —
are IDENTICAL, making the banding collision guaranteed (the family-B
recall floor), not probabilistic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sanctum_spark.operators import curation as C


def _planted_docs(spark):
    """18 docs, every survival decision forced:

    - 1/2: exact duplicates (same text) → lowest id (1) kept by clean;
    - 3: too short (< min_tokens) → dropped by clean;
    - 10/11/12: case-variants of one text (distinct md5, identical
      lowercased shingles) → guaranteed-collision near-dup cluster; doc
      1's text is `a` plus a 3-token tail (Jaccard 10/13 ≈ 0.77 vs `a`),
      so the cluster is {1, 10, 11, 12} with keeper 1 — covering BOTH
      edge kinds (identical-signature banding + near-identical verified
      pair) in one cluster;
    - 20/21: case-variants of another text → cluster, keeper 20;
    - 30: copies benchmark doc 900's text verbatim (containment 1.0)
      → dropped by decontamination;
    - 40..47: independent survivors with disjoint vocabularies;
    - 900: the benchmark document (kept OUT of the corpus side).
    """
    a = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    b = "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray"
    bench_text = (
        "question one two three answer four five six "
        "question seven eight nine answer ten eleven twelve"
    )
    fillers = [
        "red orange yellow green blue purple brown black white gray pink cyan",
        "cat dog bird fish horse sheep goat cow duck hen pig llama",
        "north south east west up down left right front back over under",
        "spring summer autumn winter january february march april may june july august",
        "iron copper zinc tin lead gold silver nickel cobalt chrome brass steel",
        "oak pine birch maple cedar spruce willow aspen elm ash beech fir",
        "violin cello flute oboe horn drum harp piano organ viola banjo lute",
        "bread butter cheese honey salt pepper sugar flour yeast milk cream egg",
    ]
    rows = (
        [(1, a + " extra tail one"), (2, a + " extra tail one")]
        + [(3, "too short")]
        + [(10, a), (11, a.upper()), (12, a.title())]
        + [(20, b), (21, b.upper())]
        + [(30, bench_text)]
        + [(40 + i, t) for i, t in enumerate(fillers)]
    )
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = spark.createDataFrame([(900, bench_text)], ["doc_id", "text"])
    return corpus, bench


PARAMS = dict(min_tokens=5, min_chars=20, max_chars=20000,
              n_hashes=16, bands=4, shingle_k=3, neardup_threshold=0.4,
              decontam_k=3, decontam_threshold=0.05,
              pack_budget=16, pack_block=8)


def _staged(spark, corpus, bench, tmpdir, params=PARAMS):
    """Stage-at-a-time execution: materialize each stage to parquet and
    read it back — what a naive orchestrator does between jobs."""
    def roundtrip(df, name):
        path = f"{tmpdir}/{name}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    cleaned = roundtrip(
        C.clean_corpus(corpus, min_tokens=params["min_tokens"],
                       min_chars=params["min_chars"],
                       max_chars=params["max_chars"]),
        "cleaned",
    )
    uniq = roundtrip(
        C.drop_near_duplicate_docs(
            cleaned, n_hashes=params["n_hashes"], bands=params["bands"],
            shingle_k=params["shingle_k"],
            threshold=params["neardup_threshold"]),
        "uniq",
    )
    final = roundtrip(
        C.drop_contaminated_docs(
            uniq, bench, k=params["decontam_k"],
            threshold=params["decontam_threshold"]),
        "final",
    )
    return C.pack_sequences(final, budget=params["pack_budget"],
                            block=params["pack_block"]), final


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fused_equals_staged_on_planted_corpus(spark, tmp_path):
    corpus, bench = _planted_docs(spark)
    fused = C.curate_and_pack(corpus, bench, **PARAMS)
    staged, _ = _staged(spark, corpus, bench, str(tmp_path))
    assert _rows(fused) == _rows(staged)


def test_stage_effects_on_planted_corpus(spark, tmp_path):
    corpus, bench = _planted_docs(spark)
    _, final = _staged(spark, corpus, bench, str(tmp_path))
    survivors = sorted(r["doc_id"] for r in final.select("doc_id").collect())
    # exact-dup pair {1,2} -> 1; 3 gated; near-dup clusters
    # {1,10,11,12} -> 1 and {20,21} -> 20; 30 decontaminated away;
    # fillers 40..47 untouched.
    assert survivors == [1, 20] + list(range(40, 48))


def test_pack_matches_python_prefix_sum(spark, tmp_path):
    corpus, bench = _planted_docs(spark)
    _, final = _staged(spark, corpus, bench, str(tmp_path))
    docs = sorted(
        (r["doc_id"], r["n_tok"])
        for r in final.select("doc_id", "n_tok").collect()
    )
    budget = PARAMS["pack_budget"]
    want: dict[int, list[tuple[int, int]]] = {}
    cum = 0
    for doc_id, n_tok in docs:
        want.setdefault(cum // budget, []).append((doc_id, n_tok))
        cum += n_tok
    want_rows = sorted(
        (pid, len(ds), sum(n for _, n in ds), min(d for d, _ in ds),
         max(d for d, _ in ds))
        for pid, ds in want.items()
    )
    got = _rows(C.curate_and_pack(corpus, bench, **PARAMS))
    assert got == want_rows


def test_fused_equals_staged_on_real_documents(spark, sf_dir, tmp_path):
    """Same equality on the driver's real documents table (sf0.001,
    production thresholds): the planted corpus can't hide a divergence
    class that only real text distributions trigger."""
    from sanctum_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 97 != 0).select("doc_id", "text")
    fused = C.curate_and_pack(corpus, bench)
    staged, _ = _staged(
        spark, corpus, bench, str(tmp_path),
        params=dict(min_tokens=10, min_chars=100, max_chars=20000,
                    n_hashes=16, bands=4, shingle_k=3,
                    neardup_threshold=0.4, decontam_k=3,
                    decontam_threshold=0.05, pack_budget=512,
                    pack_block=64),
    )
    fused_rows = _rows(fused)
    assert fused_rows == _rows(staged)
    assert len(fused_rows) > 0


def test_curation_degenerate_inputs(spark):
    """Degenerate corpus/benchmark shapes must flow through, not crash:
    an empty benchmark flags nothing, a corpus whose every doc fails the
    gates packs to zero rows, and an all-duplicates corpus keeps exactly
    one doc."""
    from pyspark.sql.types import StringType, StructField, StructType, LongType

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ])
    empty = spark.createDataFrame([], schema)
    docs = spark.createDataFrame(
        [(1, "alpha bravo charlie delta echo foxtrot")], schema
    )
    # empty benchmark: nothing is contaminated
    got = C.drop_contaminated_docs(docs, empty)
    assert [r["doc_id"] for r in got.collect()] == [1]
    # every doc gated away -> empty pack table (and no divide-by-zero in
    # the prefix sum)
    packs = C.curate_and_pack(docs, empty, min_tokens=100)
    assert packs.count() == 0
    # all-duplicates corpus -> single survivor, one pack
    dups = spark.createDataFrame(
        [(i, "kilo lima mike november oscar papa") for i in range(5)], schema
    )
    packs2 = C.curate_and_pack(dups, empty, min_tokens=3, min_chars=10)
    rows = packs2.collect()
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 1 and rows[0]["first_doc"] == 0
    # empty corpus end-to-end
    assert C.curate_and_pack(empty, empty).count() == 0


def test_fused_output_is_layout_invariant(spark):
    """The pack table must not depend on the corpus's physical layout:
    prefix sums, LSH banding, CC labels, and containment are all
    value-determined, so 1-partition and 7-partition inputs (and a
    reversed input order) must produce identical packs — the invariance
    that makes the pipeline's output reproducible across cluster sizes
    and input splits at 100 TB."""
    corpus, bench = _planted_docs(spark)
    base = _rows(C.curate_and_pack(corpus, bench, **PARAMS))
    one = _rows(C.curate_and_pack(corpus.repartition(1), bench, **PARAMS))
    seven = _rows(C.curate_and_pack(corpus.repartition(7), bench, **PARAMS))
    rev = _rows(
        C.curate_and_pack(
            corpus.orderBy(F.col("doc_id").desc()), bench, **PARAMS
        )
    )
    assert base == one == seven == rev
    assert base  # non-empty
