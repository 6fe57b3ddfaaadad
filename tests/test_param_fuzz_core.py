"""Fast regression core for the operator-parameter fuzz family
(tools/param_fuzz.py, thirteenth robustness axis — full evidence pass:
16 seeds x 12 families r9 + families M/N r10 + family O r11, 15 families total; I adds
streaming delivery, J/K/L add linkage, BM25, and BPE reference oracles,
M adds eventdump delivery+restart, N the graph power-iteration oracle).

One seeded draw per family keeps the property oracles themselves under
regression: if an operator change breaks prefix-plan bit-identity, the
minhash recall floor, simhash pigeonhole completeness, the numpy cosine
oracle, the window re-tokenization oracle, a codec round-trip, or either
parameterized cross-engine SQL rendering, this fails in the suite
instead of waiting for the next sweep run.
"""

from __future__ import annotations

import numpy as np

from tools import param_fuzz as PF


def test_param_fuzz_one_seed_all_families(spark):
    seed = 20260815 + 1  # sweep seed 1 — deterministic draw
    rng = np.random.default_rng(seed)
    rows = PF._docs(rng)
    docs_df = spark.createDataFrame(rows, ["doc_id", "text"])
    PF.FAIL.clear()
    PF.fam_a_jaccard(spark, rng, 1, docs_df)
    PF.fam_b_minhash(spark, rng, 1, docs_df, rows)
    PF.fam_c_simhash(spark, rng, 1, docs_df)
    PF.fam_d_cosine(spark, rng, 1)
    PF.fam_e_windows(spark, rng, 1, rows)
    PF.fam_f_codecs(rng, 1)
    PF.fam_g_jaccard_sql(spark, rng, 1, docs_df, rows)
    PF.fam_h_decontaminate_sql(spark, rng, 1, rows)
    assert not PF.FAIL, PF.FAIL


def test_param_fuzz_streaming_one_seed(spark):
    """One seeded draw of the streaming delivery+parameter family (I):
    keeps the independent session/EWMA/CEP oracles and the boundary
    plants (closed session merge, <=-deadline CEP) under regression."""
    rng = np.random.default_rng(20260815 + 1)
    PF.FAIL.clear()
    PF.fam_i_streaming(spark, rng, 1)
    assert not PF.FAIL, PF.FAIL


def test_param_fuzz_linkage_bm25_bpe_one_seed(spark):
    """One seeded draw each of the J/K/L families: entity resolution vs
    brute force, BM25 vs the reference formula, BPE vs an independent
    merge loop."""
    rng = np.random.default_rng(20260815 + 1)
    PF.FAIL.clear()
    PF.fam_j_linkage(spark, rng, 1)
    PF.fam_k_bm25(spark, rng, 1)
    PF.fam_l_bpe(spark, rng, 1)
    assert not PF.FAIL, PF.FAIL


def test_param_fuzz_eventdump_one_seed(spark):
    """One seeded draw of the eventdump delivery+restart family (M):
    the sanctum_eventdump DataSource's exactly-once offset replay under
    a randomized file split, a mid-stream checkpoint restart, hidden
    staging files, and the below-offset negative leg."""
    rng = np.random.default_rng(20260815 + 1)
    PF.FAIL.clear()
    PF.fam_m_eventdump(spark, rng, 1)
    assert not PF.FAIL, PF.FAIL


def test_param_fuzz_pagerank_one_seed(spark):
    """One seeded draw of the graph power-iteration family (N):
    pagerank/TextRank vs an independent Python oracle (node-set and
    edge-merge contract, fixed-iteration exactness at 1e-9)."""
    rng = np.random.default_rng(20260815 + 1)
    PF.FAIL.clear()
    PF.fam_n_pagerank(spark, rng, 1)
    assert not PF.FAIL, PF.FAIL


def test_param_fuzz_curation_one_seed(spark):
    """One seeded draw of the curation-pipeline family (O, r11): the
    fused clean->dedup->cluster->decontaminate->pack composition vs a
    plain-Python stage-by-stage oracle under random parameters."""
    rng = np.random.default_rng(20260815 + 1)
    PF.FAIL.clear()
    PF.fam_o_curation(spark, rng, 1)
    assert not PF.FAIL, PF.FAIL
