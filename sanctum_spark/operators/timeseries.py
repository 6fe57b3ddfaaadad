"""Time-series similarity operators.

Dynamic Time Warping against a broadcast reference pattern — the
distributed form of the classic time-series similarity search (cf. EDBT
2019 "Time Series Similarity Search for Streaming Data in Distributed
Systems", PAPERS.md): every key's series is bounded (days-per-key), so
the O(n*r) banded DP is a per-row kernel over key-grain rows, never a
shuffle of raw points.  The reference pattern ships inside the UDF
closure (one broadcast-sized constant), so scoring 100 TB of series is
an embarrassingly parallel scan.

Design notes:
- Sakoe-Chiba band (``radius``) caps the DP cost at O(n*r) and is the
  standard accuracy/cost dial; ``radius >= |len(a)-len(b)|`` is required
  for a finite path, enforced by widening the band to that minimum.
- numpy DP over float64 with a (2 x band) rolling buffer — the kernel
  allocates O(r), not O(n*m).
- Pure function of (series, pattern): deterministic, test-pinned against
  an independent O(n*m) reference implementation.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

# Fixed 30-point reference ramp (deterministic, engine-independent): the
# "steady growth month" template q153 scores users against.  Built from
# PURE INTEGER arithmetic (round-half-up of i*1e6/29 at e4 grain, then
# one exact int->double divide) so every engine/build constructs the
# bit-identical double — ROUND(x, 4) materializes its result through a
# build-dependent divide-back step (util.py int-grain note), which would
# poison the DTW DP inputs and with them the cross-engine distance pin.
REF_PATTERN: list[float] = [
    ((i * 2_000_000 + 29) // 58) / 10000.0 for i in range(30)
]


def dtw_banded(a: np.ndarray, b: np.ndarray, radius: int) -> float:
    """Banded DTW distance (sum of |a_i - b_j| along the optimal warp
    path, Sakoe-Chiba band ``radius``).  O(len(a) * band) time, O(band)
    memory."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return float("inf") if n != m else 0.0
    r = max(radius, abs(n - m))  # band must cover the diagonal shift
    inf = math.inf
    prev = np.full(m + 1, inf)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(m + 1, inf)
        lo = max(1, i - r)
        hi = min(m, i + r)
        ai = a[i - 1]
        # vectorized over the band: cost + min(prev[j-1], prev[j], cur[j-1])
        # needs the running cur[j-1], so the inner loop stays scalar — the
        # band is <= 2r+1 wide, which keeps this cheap per series.
        for j in range(lo, hi + 1):
            c = abs(ai - b[j - 1])
            best = prev[j]
            pj1 = prev[j - 1]
            if pj1 < best:
                best = pj1
            cj1 = cur[j - 1]
            if cj1 < best:
                best = cj1
            cur[j] = c + best
        prev = cur
    return float(prev[m])


def dtw_to_ref(
    series_col: Column, pattern: list[float], radius: int = 5
) -> Column:
    """Column expression: banded DTW distance from an array<double> column
    to a fixed ``pattern`` (closure-shipped constant)."""
    pat = np.asarray(pattern, dtype=np.float64)

    @F.pandas_udf(DoubleType())
    def _dtw(series: pd.Series) -> pd.Series:
        out = np.empty(len(series), dtype=np.float64)
        for k, s in enumerate(series):
            arr = np.asarray(s, dtype=np.float64)
            out[k] = dtw_banded(arr, pat, radius)
        return pd.Series(out)

    return _dtw(series_col)
