"""Derive sf0.05, sf0.2 and sf0.4 fixture directories from the driver's
sf0.1 testdata for the empirical scaling curve (r6 verdict task #3;
sf0.4 added in r7 for a third octave).

/root/testdata is read-only and the driver only ships sf{0.001,0.01,0.1},
so the missing curve points are DERIVED deterministically from sf0.1:

- DIMENSIONS (region, nation, customer, supplier, part) stay constant
  across scale factors — the 100 TB reality the engine designs for
  (dims broadcast; facts scale), and what keeps query semantics
  comparable across the curve.
- sf0.05 = deterministic half-sample of each FACT table on its
  top-level entity key (orders+lineitem on orderkey%2 so FK integrity
  holds; events on user_id%2 so sessions stay whole; documents on
  doc_id%2; embeddings on vec_id%2).
- sf0.2 = sf0.1 UNION a re-keyed second copy (and sf0.4 = the same
  doubling applied to sf0.2):
  * orders/lineitem: keys offset by max+1, FK-consistently;
  * events: new event_id/user_id ranges (2x users, same period —
    volume growth, constant per-user history);
  * documents: 5000 NEW docs sampled from the sf0.1 corpus's unigram
    model (empirical word frequencies + empirical doc lengths), so the
    shingle/vocabulary statistics scale the way a bigger real corpus
    would — duplicating text verbatim would instead double every
    near-dup cluster and fabricate a superlinear pair count;
  * embeddings: new unit vectors sampled around the empirical per-label
    centroids with matched intra-cluster spread (fresh iid vectors
    would erase the cluster structure q146 measures).

Everything is seeded; re-running produces byte-identical tables.
Output: <out>/sf0.05/*.parquet and <out>/sf0.2/*.parquet
(default out = /root/repo/.scalefix, gitignored).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scalefix"
DIMS = ["region", "nation", "customer", "supplier", "part"]
SEED = 20260814


def _copy(con, table: str, dst: str, sql: str) -> None:
    con.execute(
        f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
    )


def gen_half(con) -> None:
    dst = f"{OUT}/sf0.05"
    os.makedirs(dst, exist_ok=True)
    for t in DIMS:
        _copy(con, t, dst, f"SELECT * FROM src_{t}")
    _copy(con, "orders", dst, "SELECT * FROM src_orders WHERE o_orderkey % 2 = 0")
    _copy(con, "lineitem", dst, "SELECT * FROM src_lineitem WHERE l_orderkey % 2 = 0")
    _copy(con, "events", dst, "SELECT * FROM src_events WHERE user_id % 2 = 0")
    _copy(con, "documents", dst, "SELECT * FROM src_documents WHERE doc_id % 2 = 0")
    _copy(con, "embeddings", dst, "SELECT * FROM src_embeddings WHERE vec_id % 2 = 0")


def _synth_documents(con, rng: np.random.RandomState, prefix: str = "src") -> pa.Table:
    """len(corpus) new docs from the source corpus's unigram model."""
    rows = con.execute(
        f"SELECT doc_id, text, lang, source FROM {prefix}_documents"
    ).fetchall()
    from collections import Counter

    freq: Counter = Counter()
    lengths: list[int] = []
    lang_src: list[tuple[str, str]] = []
    for _, text, lang, source in rows:
        toks = (text or "").split()
        freq.update(toks)
        lengths.append(len(toks))
        lang_src.append((lang, source))
    vocab = sorted(freq)
    p = np.array([freq[w] for w in vocab], dtype=float)
    p /= p.sum()
    n_new = len(rows)
    max_id = max(r[0] for r in rows)
    ids, texts, langs, sources, n_chars = [], [], [], [], []
    len_choices = rng.choice(len(lengths), size=n_new)
    ls_choices = rng.choice(len(lang_src), size=n_new)
    for i in range(n_new):
        n_tok = max(lengths[len_choices[i]], 1)
        words = rng.choice(vocab, size=n_tok, p=p)
        text = " ".join(words)
        ids.append(max_id + 1 + i)
        texts.append(text)
        lang, source = lang_src[ls_choices[i]]
        langs.append(lang)
        sources.append(source)
        n_chars.append(len(text))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )


def _synth_embeddings(con, rng: np.random.RandomState, prefix: str = "src") -> pa.Table:
    """New unit vectors around empirical per-label centroids."""
    rows = con.execute(
        f"SELECT vec_id, embedding, label FROM {prefix}_embeddings"
    ).fetchall()
    max_id = max(r[0] for r in rows)
    by_label: dict[int, list[np.ndarray]] = {}
    for _, emb, label in rows:
        by_label.setdefault(label, []).append(np.array(emb, dtype=np.float64))
    stats = {}
    for label, vs in by_label.items():
        m = np.mean(vs, axis=0)
        spread = float(np.mean([np.linalg.norm(v - m) for v in vs]))
        stats[label] = (m, spread, len(vs))
    labels = sorted(stats)
    weights = np.array([stats[l][2] for l in labels], dtype=float)
    weights /= weights.sum()
    n_new = len(rows)
    dim = len(rows[0][1])
    ids, embs, labs = [], [], []
    lab_choices = rng.choice(len(labels), size=n_new, p=weights)
    for i in range(n_new):
        label = labels[lab_choices[i]]
        m, spread, _ = stats[label]
        noise = rng.normal(0.0, 1.0, dim)
        noise *= spread / max(np.linalg.norm(noise), 1e-12)
        v = m + noise
        v /= max(np.linalg.norm(v), 1e-12)
        ids.append(max_id + 1 + i)
        embs.append([float(x) for x in v])
        labs.append(int(label))
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(embs, pa.list_(pa.float32())),
            "label": pa.array(labs, pa.int32()),
        }
    )


def gen_double(
    con,
    dst_name: str = "sf0.2",
    prefix: str = "src",
    src_dir: str = SRC,
    seed: int = SEED,
) -> None:
    """Write <OUT>/<dst_name> = the <prefix>_* tables UNION a re-keyed
    second copy (same scheme at every octave, so sf0.4 = double(sf0.2))."""
    dst = f"{OUT}/{dst_name}"
    os.makedirs(dst, exist_ok=True)
    for t in DIMS:
        _copy(con, t, dst, f"SELECT * FROM {prefix}_{t}")
    ok = con.execute(f"SELECT MAX(o_orderkey)+1 FROM {prefix}_orders").fetchone()[0]
    cols_o = [
        c
        for c in con.execute(f"SELECT * FROM {prefix}_orders LIMIT 0").df().columns
        if c != "o_orderkey"
    ]
    _copy(
        con,
        "orders",
        dst,
        f"SELECT * FROM {prefix}_orders UNION ALL "
        f"SELECT o_orderkey + {ok} AS o_orderkey, {', '.join(cols_o)} FROM {prefix}_orders",
    )
    cols_l = [
        c
        for c in con.execute(f"SELECT * FROM {prefix}_lineitem LIMIT 0").df().columns
        if c != "l_orderkey"
    ]
    _copy(
        con,
        "lineitem",
        dst,
        f"SELECT * FROM {prefix}_lineitem UNION ALL "
        f"SELECT l_orderkey + {ok} AS l_orderkey, {', '.join(cols_l)} FROM {prefix}_lineitem",
    )
    ek = con.execute(f"SELECT MAX(event_id)+1 FROM {prefix}_events").fetchone()[0]
    uk = con.execute(f"SELECT MAX(user_id)+1 FROM {prefix}_events").fetchone()[0]
    _copy(
        con,
        "events",
        dst,
        f"SELECT * FROM {prefix}_events UNION ALL "
        f"SELECT event_id + {ek} AS event_id, ts, user_id + {uk} AS user_id, "
        f"event_type, value, props FROM {prefix}_events",
    )
    rng = np.random.RandomState(seed)
    new_docs = _synth_documents(con, rng, prefix)
    base_docs = pq.read_table(f"{src_dir}/documents.parquet").cast(new_docs.schema)
    pq.write_table(
        pa.concat_tables([base_docs, new_docs]), f"{dst}/documents.parquet"
    )
    new_emb = _synth_embeddings(con, rng, prefix)
    base_emb = pq.read_table(f"{src_dir}/embeddings.parquet").cast(new_emb.schema)
    pq.write_table(
        pa.concat_tables([base_emb, new_emb]), f"{dst}/embeddings.parquet"
    )


def _require_octave(flag: str, src_dir: str, gen_flag: str | None) -> None:
    """Opt-in octaves chain (sfN = double(sfN/2)); a missing prerequisite
    dir used to surface as a raw DuckDB read_parquet error (r10 ADVICE
    item 3).  Exit with the flag that generates the missing rung instead."""
    if not os.path.isdir(src_dir):
        hint = (
            f"pass {gen_flag} in the same run to generate it first"
            if gen_flag
            else "the base octaves are generated unconditionally — run without flags first"
        )
        raise SystemExit(
            f"{flag}: prerequisite {src_dir} does not exist; {hint}"
        )


_OCTAVE_CHAIN: list[tuple[str, str, str | None]] = [
    # (flag, prerequisite dir, flag that generates the prerequisite —
    #  None when the base run always produces it)
    ("--octave4", "sf0.4", None),
    ("--octave5", "sf0.8", "--octave4"),
    ("--octave6", "sf1.6", "--octave5"),
    ("--octave7", "sf3.2", "--octave6"),
    ("--octave8", "sf6.4", "--octave7"),
    ("--octave9", "sf12.8", "--octave8"),
]


def main() -> None:
    # Fail fast on broken octave chains BEFORE the (multi-minute) base
    # generation: each opt-in octave needs its prerequisite either on
    # disk already or produced by an earlier flag in the same run.
    for flag, src, gen_flag in _OCTAVE_CHAIN:
        if flag in sys.argv and gen_flag is not None and gen_flag not in sys.argv:
            _require_octave(flag, f"{OUT}/{src}", gen_flag)
    con = duckdb.connect()
    for t in DIMS + ["orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW src_{t} AS SELECT * FROM "
            f"read_parquet('{SRC}/{t}.parquet')"
        )
    gen_half(con)
    gen_double(con)
    # third octave: sf0.4 = double(sf0.2), same re-keying scheme.  A
    # distinct seed keeps the synthesized docs/vectors independent of the
    # sf0.2 batch (re-running any single target stays deterministic).
    for t in DIMS + ["orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW d2_{t} AS SELECT * FROM "
            f"read_parquet('{OUT}/sf0.2/{t}.parquet')"
        )
    gen_double(
        con, dst_name="sf0.4", prefix="d2", src_dir=f"{OUT}/sf0.2", seed=SEED + 1
    )
    targets = ["sf0.05", "sf0.2", "sf0.4"]
    # fourth octave (opt-in: --octave4): sf0.8 = double(sf0.4) — 8x the
    # bench SF, 40k docs.  Opt-in because the unigram-model synthesis is
    # a few driver-side minutes and most sessions only need three octaves.
    if "--octave4" in sys.argv:
        _require_octave("--octave4", f"{OUT}/sf0.4", None)
        for t in DIMS + ["orders", "lineitem", "events", "documents", "embeddings"]:
            con.execute(
                f"CREATE VIEW d4_{t} AS SELECT * FROM "
                f"read_parquet('{OUT}/sf0.4/{t}.parquet')"
            )
        gen_double(
            con, dst_name="sf0.8", prefix="d4", src_dir=f"{OUT}/sf0.4",
            seed=SEED + 2,
        )
        targets.append("sf0.8")
    # fifth octave (opt-in: --octave5, implies sf0.8 exists): sf1.6 =
    # double(sf0.8) — 16x the bench SF, 80k docs.  Used for spot checks
    # that a slope holds one octave past where a defect class appeared
    # (r8's union-mirror double execution only showed at the octave
    # boundary).
    if "--octave5" in sys.argv:
        _require_octave("--octave5", f"{OUT}/sf0.8", "--octave4")
        for t in DIMS + ["orders", "lineitem", "events", "documents", "embeddings"]:
            con.execute(
                f"CREATE VIEW d8_{t} AS SELECT * FROM "
                f"read_parquet('{OUT}/sf0.8/{t}.parquet')"
            )
        gen_double(
            con, dst_name="sf1.6", prefix="d8", src_dir=f"{OUT}/sf0.8",
            seed=SEED + 3,
        )
        targets.append("sf1.6")
    # sixth octave (opt-in: --octave6, implies sf1.6 exists): sf3.2 =
    # double(sf1.6) — 32x the bench SF, 160k docs.  Exists to extend the
    # PRODUCTION-path slope (MinHash-banded clustering) past the octave
    # where the exact path's quadratic candidate term took over (r9).
    if "--octave6" in sys.argv:
        _require_octave("--octave6", f"{OUT}/sf1.6", "--octave5")
        for t in DIMS + ["orders", "lineitem", "events", "documents", "embeddings"]:
            con.execute(
                f"CREATE VIEW d16_{t} AS SELECT * FROM "
                f"read_parquet('{OUT}/sf1.6/{t}.parquet')"
            )
        gen_double(
            con, dst_name="sf3.2", prefix="d16", src_dir=f"{OUT}/sf1.6",
            seed=SEED + 4,
        )
        targets.append("sf3.2")
    # seventh octave (opt-in: --octave7, implies sf3.2 exists): sf6.4 =
    # double(sf3.2) — 64x the bench SF, 320k docs.  Flagship-path slope
    # confirmation only (minhash pairs + MinHash-edge clustering).
    if "--octave7" in sys.argv:
        _require_octave("--octave7", f"{OUT}/sf3.2", "--octave6")
        for t in DIMS + ["orders", "lineitem", "events", "documents", "embeddings"]:
            con.execute(
                f"CREATE VIEW d32_{t} AS SELECT * FROM "
                f"read_parquet('{OUT}/sf3.2/{t}.parquet')"
            )
        gen_double(
            con, dst_name="sf6.4", prefix="d32", src_dir=f"{OUT}/sf3.2",
            seed=SEED + 5,
        )
        targets.append("sf6.4")
    # eighth octave (opt-in: --octave8, implies sf6.4 exists): sf12.8 =
    # double(sf6.4) — 128x the bench SF, 640k docs.  Exists for the r9
    # verdict's boundary check: q05 (2.07x) and q104-fixed (2.00x) sat
    # exactly at the 2x/doubling allowance at sf6.4, which is where
    # q99's hidden-double-execution class first surfaced.
    if "--octave8" in sys.argv:
        _require_octave("--octave8", f"{OUT}/sf6.4", "--octave7")
        for t in DIMS + ["orders", "lineitem", "events", "documents", "embeddings"]:
            con.execute(
                f"CREATE VIEW d64_{t} AS SELECT * FROM "
                f"read_parquet('{OUT}/sf6.4/{t}.parquet')"
            )
        gen_double(
            con, dst_name="sf12.8", prefix="d64", src_dir=f"{OUT}/sf6.4",
            seed=SEED + 6,
        )
        targets.append("sf12.8")
    # ninth octave (opt-in: --octave9, implies sf12.8 exists): sf25.6 =
    # double(sf12.8) — 256x the bench SF, lineitem 153.6M rows.  Exists
    # to hold q05's regime-pinned fact-fact SMJ slope one octave past
    # the r10 plan-flip boundary.
    if "--octave9" in sys.argv:
        _require_octave("--octave9", f"{OUT}/sf12.8", "--octave8")
        for t in DIMS + ["orders", "lineitem", "events", "documents", "embeddings"]:
            con.execute(
                f"CREATE VIEW d128_{t} AS SELECT * FROM "
                f"read_parquet('{OUT}/sf12.8/{t}.parquet')"
            )
        gen_double(
            con, dst_name="sf25.6", prefix="d128", src_dir=f"{OUT}/sf12.8",
            seed=SEED + 7,
        )
        targets.append("sf25.6")
    # tenth octave (opt-in: --octave10, implies sf25.6 exists): sf51.2 =
    # double(sf25.6) — 512x the bench SF, lineitem 307.2M rows, ~12 GB.
    # Exists for the r12 verdict's task #4: hold the fused curation
    # pipeline's slope (1.68x/doubling at sf25.6) one more octave with
    # the standard AQE-final signature diff.
    if "--octave10" in sys.argv:
        _require_octave("--octave10", f"{OUT}/sf25.6", "--octave9")
        for t in DIMS + ["orders", "lineitem", "events", "documents", "embeddings"]:
            con.execute(
                f"CREATE VIEW d256_{t} AS SELECT * FROM "
                f"read_parquet('{OUT}/sf25.6/{t}.parquet')"
            )
        gen_double(
            con, dst_name="sf51.2", prefix="d256", src_dir=f"{OUT}/sf25.6",
            seed=SEED + 8,
        )
        targets.append("sf51.2")
    for sf in targets:
        sizes = {
            t: pq.read_metadata(f"{OUT}/{sf}/{t}.parquet").num_rows
            for t in ["lineitem", "orders", "events", "documents", "embeddings"]
        }
        print(sf, sizes)


if __name__ == "__main__":
    main()
