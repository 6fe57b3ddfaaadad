"""End-to-end LLM training-corpus curation pipeline.

Run:  python examples/corpus_pipeline.py [sf_dir]

Chains the engine's pipeline operators the way a 100 TB curation job
would: exact dedup → near-dup pair generation (banded MinHash, the scale
path) → dedup clustering (connected components) → keeper selection →
benchmark decontamination → quality + repetition gates → deterministic
per-language stratified sampling → quality-weighted mix sampling → BPE
vocabulary training + tokenization → Z-order layout for the final write.
Every step is the same operator the oracle-checked queries use
(q92/q74/q99/q104/q105/q93/q126/q129/q128), so this script is a
composition demo, not a separate code path.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from sanctum_spark.io import load_table  # noqa: E402
from sanctum_spark.operators.dedup import (  # noqa: E402
    connected_components,
    drop_exact_duplicates,
    minhash_near_duplicates,
)
from sanctum_spark.operators.text import (  # noqa: E402
    decontaminate,
    repetition_profile,
    token_count,
)
from sanctum_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus_pipeline")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. exact dedup: one digest shuffle, lowest doc_id kept
    docs = drop_exact_duplicates(docs, "text", "doc_id")
    n1 = docs.count()

    # 1b. sub-document boilerplate gate: drop docs more than half made of
    # segments already seen elsewhere (CCNet line-dedup shape; hashed
    # 8-byte window keys — the 100 TB path)
    from sanctum_spark.operators.dedup import segment_dedup_profile

    boiler = (
        segment_dedup_profile(docs, "text", "doc_id", hashed=True)
        .filter(F.col("dup_ratio") > 0.5)
        .select("doc_id")
    )
    docs = docs.join(boiler, "doc_id", "left_anti")
    n1b = docs.count()

    # 2. near-dup pairs via banded MinHash (the 100 TB path), then
    # 3. collapse pairs into clusters and keep each cluster's min doc_id
    pairs = minhash_near_duplicates(
        docs, "text", "doc_id", n_hashes=16, bands=4, threshold=0.5
    )
    comp = connected_components(pairs, "id_a", "id_b")
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    docs = docs.join(losers, "doc_id", "left_anti")
    n2 = docs.count()

    # 4. benchmark decontamination: drop docs carrying eval-set n-grams
    # (here the held-out slice doc_id % 97 = 0 stands in for the suite)
    bench = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 97 == 0)
    contaminated = decontaminate(
        docs, bench, "text", "doc_id", k=3, threshold=0.5
    ).select("doc_id")
    docs = docs.join(contaminated, "doc_id", "left_anti")
    n3 = docs.count()

    # 5. quality + repetition gates (token/length bands, Gopher dup-frac)
    rep = repetition_profile(docs, "text", "doc_id").filter(
        F.col("dup_bigram_frac") > 0.6
    ).select("doc_id")
    docs = (
        docs.join(rep, "doc_id", "left_anti")
        .withColumn("n_tokens", token_count(F.col("text")))
        .filter(
            (F.col("n_tokens") >= 10)
            & (F.length("text") >= 100)
            & (F.length("text") <= 20000)
        )
    )
    n4 = docs.count()

    # 6. deterministic content-hash stratified sample (downweight 'en')
    bucket = F.expr("instr('0123456789abcdef', substring(md5(text), 32, 1))")
    docs = docs.withColumn("bucket", bucket).filter(
        ((F.col("lang") == "en") & (F.col("bucket") <= 2))
        | ((F.col("lang") != "en") & (F.col("bucket") <= 8))
    )
    n5 = docs.count()

    # 7. quality-weighted mix sampling (content-hash uniform vs weight;
    # deterministic across engines/runs/cluster layouts)
    u16 = F.lit(0)
    for k, pos in enumerate((29, 30, 31, 32)):
        d = F.expr(f"instr('0123456789abcdef', substring(md5(text), {pos}, 1))") - 1
        u16 = u16 + d * (16 ** (3 - k))
    w = F.least(F.lit(1.0), F.length("text") / F.lit(1000.0))
    docs = docs.filter(u16.cast("long") < w * 65536)
    n6 = docs.count()

    # 8. BPE: learn merges from the word-frequency table (the only
    # corpus pass is one word count), tokenize with the Arrow kernel
    from sanctum_spark.operators.bpe import bpe_apply, bpe_train

    merges = bpe_train(docs, "text", n_merges=60, max_words=20_000)
    docs = bpe_apply(docs, merges, "text").withColumn(
        "n_bpe_tokens", F.size("bpe_tokens")
    )

    # 9. Z-order the final layout so scans prune on (lang, n_bpe_tokens)
    from sanctum_spark.operators.layout import zorder_by

    final = zorder_by(
        docs.withColumn("lang_code", F.crc32("lang")), ["lang_code", "n_bpe_tokens"],
        n_partitions=4,
    )

    print(
        f"corpus: {n0} raw -> {n1} exact-deduped -> {n1b} boilerplate-gated "
        f"-> {n2} near-dedup-clustered "
        f"-> {n3} decontaminated -> {n4} quality-gated -> {n5} sampled "
        f"-> {n6} mix-weighted; {len(merges)} BPE merges learned"
    )
    final.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_bpe_tokens").alias("bpe_tokens")
    ).orderBy("lang").show()
    spark.stop()


if __name__ == "__main__":
    main()
