"""Positional + index-prefix filter attribution for the prefix-filtered
Jaccard plan.

Two metrics per corpus, q99/q158's exact shape (k=3, t=0.4, hashed):

1. candidate-pair counts — a DETERMINISTIC metric, immune to the
   host's co-tenant timing spikes: ON (positional+index) vs OFF
   (neither), plus each conjunct alone so their contributions are
   attributable; final pair count is printed alongside as the
   invariant (must be identical on both sides).
2. interleaved paired wall time of the full pairs computation
   (ON OFF ON OFF ... inside one warm session, median of per-round
   ratios) — the drift-robust timing protocol from tools/octave_ab.py.

Usage: python tools/ppjoin_positional_ab.py [rounds] [corpus_dir ...]
Defaults: 3 rounds; corpora = /root/testdata/sf0.1 plus
<repo_root>/.scalefix/{sf0.2,sf0.4} when present.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    corpora = sys.argv[2:] or [
        d
        for d in (
            "/root/testdata/sf0.1",
            os.path.join(REPO_ROOT, ".scalefix", "sf0.2"),
            os.path.join(REPO_ROOT, ".scalefix", "sf0.4"),
        )
        if os.path.isdir(d)
    ]

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from sanctum_spark.operators.dedup import ngram_jaccard_pairs
    from sanctum_spark.io import load_table
    from sanctum_spark.session import get_spark

    spark = get_spark("ppjoin_positional_ab")
    out = {}
    for corpus in corpora:
        docs = load_table(spark, corpus, "documents")

        def pairs(positional: bool, index: bool = True,
                  candidates: bool = False):
            return ngram_jaccard_pairs(
                docs, "text", "doc_id", shingle_k=3, threshold=0.4,
                hashed=True, positional_filter=positional,
                index_prefix_filter=index, _candidates_only=candidates,
            )

        # deterministic pruning-power metric, each conjunct attributed:
        # on = positional+index, off = neither; single-conjunct counts
        # separate the two filters' contributions.
        cand_on = pairs(True, True, candidates=True).count()
        cand_off = pairs(False, False, candidates=True).count()
        cand_pos_only = pairs(True, False, candidates=True).count()
        cand_idx_only = pairs(False, True, candidates=True).count()
        n_on = pairs(True, True).count()
        n_off = pairs(False, False).count()
        assert n_on == n_off, (corpus, n_on, n_off)

        def run(positional: bool) -> float:
            t0 = time.perf_counter()
            pairs(positional, positional).count()  # on=(T,T), off=(F,F)
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            return dt

        run(True)  # warm both plan shapes
        run(False)
        ratios, ons, offs = [], [], []
        for _ in range(rounds):
            t_on = run(True)
            t_off = run(False)
            ratios.append(t_on / t_off)
            ons.append(t_on)
            offs.append(t_off)
        out[corpus] = {
            "cand_on": cand_on,
            "cand_off": cand_off,
            "cand_pos_only": cand_pos_only,
            "cand_idx_only": cand_idx_only,
            "cand_reduction": round(1 - cand_on / cand_off, 4) if cand_off else 0.0,
            "pairs": n_on,
            "wall_on_med": round(statistics.median(ons), 3),
            "wall_off_med": round(statistics.median(offs), 3),
            "ratio_on_over_off_med": round(statistics.median(ratios), 3),
            # raw per-round (on, off) walls: co-tenant spike rounds are
            # identifiable post-hoc instead of silently skewing medians
            "rounds": [(round(a, 3), round(b, 3)) for a, b in zip(ons, offs)],
        }
        print(json.dumps({corpus: out[corpus]}), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
