"""Full-registry empty-input sweep: zero-row copies of every table
schema, all queries run, oracle-paired ones compared driver-style.
Expected steady state (r6): 144 match + 12 rows-only + the 3 documented
rollup/cube/grouping-sets grand-total divergences (q30/q31/q32 — see
tests/test_empty_input.py).

Usage: PYTHONPATH=. python tools/empty_sweep.py
"""

import sys
import tempfile

sys.path.insert(0, ".")

import pyarrow as pa
import pyarrow.parquet as pq

from tools.sweep_common import SRC, TABLES, run_sweep

sf = tempfile.mkdtemp(prefix="sf_empty_")
for t in TABLES:
    schema = pq.read_schema(f"{SRC}/{t}.parquet")
    schema = pa.schema([schema.field(i) for i in range(len(schema.names))])
    pq.write_table(schema.empty_table(), f"{sf}/{t}.parquet")

run_sweep(sf, "empty_sweep")
