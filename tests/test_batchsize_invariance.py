"""Fast regression core for the Arrow-batch-size invariance axis
(tenth robustness family — full-registry evidence pass:
tools/batchsize_sweep.py, 159/159 clean at sf0.001, r7).

``spark.sql.execution.arrow.maxRecordsPerBatch`` is an engine tunable:
131072 in this repo's sessions, 10000 stock Spark, and effectively
arbitrary on a real cluster (upstream operators and memory pressure
change batching).  Results must be a pure function of table content —
any batch-local assumption in a Python-boundary operator (batch-local
normalization in a "vectorized" cast, state carried across yields,
batch-edge special-casing) diverges when every boundary suddenly sees
7-row batches instead of one batch per partition.

The six queries here are the most batch-shaped surfaces: the vectorized
spell cast (whole-batch pandas expression), the grouped-agg scalar
pandas_udf, the mapInPandas fan-out generator, grouped-map
applyInPandas, the multimodal decode mapInPandas, and the DTW Arrow
kernel.
"""

from __future__ import annotations

import pytest

CORE = [
    "q82_spell_cast_vectorized",
    "q83_grouped_agg_udf",
    "q84_spell_fanout_udtf",
    "q85_grouped_map_normalize",
    "q90_multimodal_features",
    "q153_dtw_similarity",
]

BATCH_KEY = "spark.sql.execution.arrow.maxRecordsPerBatch"


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1).astype(str)
    if len(df) == 0:
        return df.reset_index(drop=True)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", CORE)
def test_batch_size_invariant(spark, sf_dir, name):
    import sanctum_spark.queries as qreg

    qreg.load_all_modules()
    q = qreg.REGISTRY[name]
    base = _canon(q.fn(spark, sf_dir).toPandas())
    saved = spark.conf.get(BATCH_KEY)
    spark.conf.set(BATCH_KEY, "7")
    try:
        tiny = _canon(q.fn(spark, sf_dir).toPandas())
    finally:
        spark.conf.set(BATCH_KEY, saved)
    if not base.equals(tiny):
        # Likelier failure mode is same row count with diverging values;
        # surface the first differing rows, not just the counts (ADVICE r7).
        base_rows = {tuple(map(repr, t)) for t in base.itertuples(index=False)}
        tiny_rows = {tuple(map(repr, t)) for t in tiny.itertuples(index=False)}
        only_base = sorted(base_rows - tiny_rows)[:5]
        only_tiny = sorted(tiny_rows - base_rows)[:5]
        if only_base or only_tiny:
            detail = (
                f"first rows only at default batch: {only_base}; "
                f"first rows only at batch=7: {only_tiny}"
            )
        else:
            # Same row multiset — the divergence is ordering/dtype-level.
            detail = (
                f"row sets equal; dtypes default={list(base.dtypes)} "
                f"vs batch7={list(tiny.dtypes)}"
            )
        raise AssertionError(
            f"{name} is batch-size-dependent: {len(base)} vs {len(tiny)} "
            f"rows; {detail}"
        )
