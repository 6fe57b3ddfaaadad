"""Bench discipline (r6 verdict task #7): compare a fresh BENCH_DETAIL
per-query timing set against a reference detail (e.g. the r6 snapshot's)
by MEDIAN RATIO, and list every common query whose ratio exceeds the
attribution threshold (1.5x) in either direction.

Usage:
    git show <r6-commit>:BENCH_DETAIL.json > /tmp/detail_r6.json
    python tools/bench_compare.py /tmp/detail_r6.json BENCH_DETAIL.json
"""

from __future__ import annotations

import json
import statistics
import sys


def load(path: str) -> dict[str, float]:
    d = json.load(open(path))
    q = d.get("queries", d)
    return {k: float(v) for k, v in q.items()}


def main() -> None:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    common = sorted(set(old) & set(new))
    ratios = {k: new[k] / old[k] for k in common if old[k] > 0}
    med = statistics.median(ratios.values())
    print(f"common queries: {len(common)}  median ratio: {med:.3f}")
    flagged = {k: r for k, r in ratios.items() if r > 1.5 or r < 1 / 1.5}
    for k, r in sorted(flagged.items(), key=lambda kv: -kv[1]):
        print(f"  {k}: {old[k]:.3f} -> {new[k]:.3f}  ({r:.2f}x)")
    if not flagged:
        print("  no query beyond the 1.5x attribution threshold")


if __name__ == "__main__":
    main()
