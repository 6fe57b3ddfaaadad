"""Interleaved octave ratio measurement (drift-robust scaling slope).

tools/scaling_curve.py runs each scale factor as its own sequential JVM
leg; on a co-tenant host, load drift BETWEEN legs becomes fake slope
(observed: q01, scale-independent at these sizes, read 0.38 / 1.05 /
0.38 s across three legs of one run).  This runner measures ONE octave
(default sf0.2 -> sf0.4) by ALTERNATING the two sides per round inside
a single warm session — A B A B ... — so any load drift multiplies both
sides of each round equally and the per-round ratio stays clean.  The
reported ratio is median(B_i / A_i) over paired rounds, which is robust
to both drift and isolated spikes.

Usage:
    python tools/octave_ab.py [A_dir B_dir [rounds [q1,q2,...]]]
The optional 4th argument restricts the run to a comma-separated subset
of registry query names (default: the standing QUERIES list below).
Defaults: <repo_root>/.scalefix/sf0.2 and .../sf0.4 (derived from this
file's location, not hardcoded absolute — ADVICE r7), 5 rounds; both
directories must exist (generate with tools/gen_scale_fixtures.py).  Thread
count comes from SPARK_GRAFT_CPUS (default 32) and is echoed in the
output so a run on a different host is attributable.
Prints one JSON line: {query: {"a_med": s, "b_med": s, "ratio_med": r}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q01_pricing_summary",
    "q05_local_supplier_volume",
    "q70_exact_dedup",
    "q74_minhash_lsh_pairs",
    "q99_dedup_clusters",
    "q104_fixed_bench",
    "q108_sequence_packing",
    "q142_cross_source_overlap",
    "q146_embedding_clusters",
    "q152_cep_pattern",
]


def _q104_fixed_bench(spark, sf_dir):
    """q104's production shape for the scaling curve (r8 verdict task 4).

    The registered q104 takes its benchmark slice as doc_id % 97 == 0, so
    in the derived octave fixtures BOTH join sides double with the corpus
    and the slope table read 2.17x/doubling for a pipeline whose real
    deployment shape — a FIXED-size eval suite against a growing training
    corpus — is linear in the corpus.  This measurement variant pins the
    benchmark to the sf0.1-native ids (doc_id < 5000; every derived
    octave keeps the original docs and appends new ids above 5000), so
    the benchmark stays a constant 52 docs at every octave and the slope
    measures the corpus-side broadcast semi-join, i.e. the production
    shape.  The registered query is unchanged (oracle-paired, frozen
    registry)."""
    from pyspark.sql import functions as F

    from sanctum_spark.io import load_table
    from sanctum_spark.operators.text import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter((F.col("doc_id") % 97 == 0) & (F.col("doc_id") < 5000))
    train = docs.filter((F.col("doc_id") % 97 != 0) | (F.col("doc_id") >= 5000))
    return decontaminate(train, bench, "text", "doc_id", k=3, threshold=0.05)


def _q99_minhash_edges(spark, sf_dir):
    """q99's PRODUCTION shape for the scaling curve (r9 fifth-octave
    finding).

    The registered q99 sources its cluster edges from EXACT n-gram
    Jaccard (the oracle-able validator).  The fifth octave (sf0.8 ->
    sf1.6) measured the exact path's distinct candidate volume at 4.14x
    per corpus doubling (17.6M -> 72.8M): at threshold 0.4 the PPJoin
    prefix keeps ~60% of shingle instances, and every shingle's document
    frequency doubles with the corpus, so candidates grow with dfreq² —
    quadratic BY CONSTRUCTION on any corpus whose shingle frequencies
    scale, which is exactly why the operator's contract says the exact
    form is a validator.  The production edge source at 100 TB is
    MinHash-LSH banding (q74's shape, measured 2.03x/doubling at the
    same octave) with exact-Jaccard verification on candidates only;
    the CC operator is edge-source-agnostic (q99's own doc).  This
    variant measures that composition end to end."""
    from pyspark.sql import functions as F

    from sanctum_spark.io import load_table
    from sanctum_spark.operators.dedup import (
        connected_components,
        minhash_near_duplicates,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(
        docs, "text", "doc_id", n_hashes=16, bands=4, shingle_k=3, threshold=0.4
    )
    comp = connected_components(pairs, "id_a", "id_b")
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(sizes, "component").select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        "cluster_size",
    )


# Measurement-only variants: production shapes the frozen registry can't
# express (name -> callable(spark, sf_dir) -> DataFrame).
VARIANTS = {
    "q104_fixed_bench": _q104_fixed_bench,
    "q99_minhash_edges": _q99_minhash_edges,
}


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    a_dir = (
        sys.argv[1] if len(sys.argv) > 1
        else os.path.join(REPO_ROOT, ".scalefix", "sf0.2")
    )
    b_dir = (
        sys.argv[2] if len(sys.argv) > 2
        else os.path.join(REPO_ROOT, ".scalefix", "sf0.4")
    )
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    queries = sys.argv[4].split(",") if len(sys.argv) > 4 else QUERIES
    for d in (a_dir, b_dir):
        if not os.path.isdir(d):
            sys.exit(
                f"fixture dir missing: {d} — generate with "
                "tools/gen_scale_fixtures.py (pass A_dir B_dir explicitly "
                "for non-default scale factors)"
            )

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    cpus = os.environ["SPARK_GRAFT_CPUS"]
    print(json.dumps({"a_dir": a_dir, "b_dir": b_dir, "cpus": cpus,
                      "rounds": rounds}), file=sys.stderr)
    import sanctum_spark.queries as qreg
    from sanctum_spark.session import get_spark

    qreg.load_all_modules()
    spark = get_spark("octave_ab")

    def run(name: str, sf: str) -> float:
        fn = VARIANTS.get(name) or qreg.REGISTRY[name].fn
        t0 = time.perf_counter()
        fn(spark, sf).count()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    out = {}
    for name in queries:
        run(name, a_dir)  # warm codegen/page cache for both sides
        run(name, b_dir)
        pairs = []
        for _ in range(rounds):
            ta = run(name, a_dir)
            tb = run(name, b_dir)
            pairs.append((ta, tb))
        out[name] = {
            "a_med": round(statistics.median(p[0] for p in pairs), 3),
            "b_med": round(statistics.median(p[1] for p in pairs), 3),
            "ratio_med": round(
                statistics.median(p[1] / p[0] for p in pairs), 2
            ),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
