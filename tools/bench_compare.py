"""Bench discipline (r6 verdict task #7): compare a fresh BENCH_DETAIL
per-query timing set against a reference detail (e.g. the r6 snapshot's)
by MEDIAN RATIO, and list every common query whose ratio exceeds the
attribution threshold (1.5x) in either direction.

Since r13 each side's derived ``calibration.window_quality`` verdict
(ok / degraded-start / degraded-end / degraded, computed by
bench._window_quality from the run's own canaries) is printed and
interpreted: when EITHER side ran in a degraded window, absolute
deltas are not comparable and the tool says so explicitly — only
ratio PATTERNS (a single attributed mover vs a uniform shift) are
meaningful, per the standing host-variance protocol.

Usage:
    git show <r6-commit>:BENCH_DETAIL.json > /tmp/detail_r6.json
    python tools/bench_compare.py /tmp/detail_r6.json BENCH_DETAIL.json
"""

from __future__ import annotations

import json
import statistics
import sys


def load(path: str) -> dict:
    return json.load(open(path))


def queries(d: dict) -> dict[str, float]:
    q = d.get("queries", d)
    return {k: float(v) for k, v in q.items()}


def window_verdict(d: dict) -> str:
    """The artifact's self-classification, recomputing it for artifacts
    that predate the derived field (their canaries are still present)."""
    calib = d.get("calibration")
    if not isinstance(calib, dict):
        return "unknown (no calibration block)"
    if "window_quality" in calib:
        return str(calib["window_quality"])
    try:  # pre-r13 artifact: derive from its recorded canaries
        sys.path.insert(0, __file__.rsplit("/", 2)[0])
        from bench import _window_quality

        cpus = int(d.get("cpus") or 32)
        return f"{_window_quality(calib, cpus)} (derived, pre-r13 artifact)"
    except Exception:
        return "unknown"


def main() -> None:
    old_d, new_d = load(sys.argv[1]), load(sys.argv[2])
    old, new = queries(old_d), queries(new_d)
    old_w, new_w = window_verdict(old_d), window_verdict(new_d)
    print(f"baseline window: {old_w}")
    print(f"candidate window: {new_w}")
    common = sorted(set(old) & set(new))
    ratios = {k: new[k] / old[k] for k in common if old[k] > 0}
    med = statistics.median(ratios.values())
    print(f"common queries: {len(common)}  median ratio: {med:.3f}")
    degraded = any(w.startswith("degraded") for w in (old_w, new_w))
    if degraded:
        print(
            "  NOTE: a side self-classifies degraded — absolutes are not"
            " comparable; read only ratio patterns (one attributed mover"
            " vs a uniform shift), per the host-variance protocol"
        )
    flagged = {k: r for k, r in ratios.items() if r > 1.5 or r < 1 / 1.5}
    for k, r in sorted(flagged.items(), key=lambda kv: -kv[1]):
        print(f"  {k}: {old[k]:.3f} -> {new[k]:.3f}  ({r:.2f}x)")
    if not flagged:
        print("  no query beyond the 1.5x attribution threshold")


if __name__ == "__main__":
    main()
