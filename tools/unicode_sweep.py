"""Registry sweep: sf0.001 documents augmented with Unicode-edge rows —
CJK (no spaces), emoji + ZWJ, combining marks, Turkish dotted/dotless I,
NBSP and ideographic space, RTL Arabic, mixed scripts."""
import os, json, tempfile, shutil
os.environ.setdefault("SPARK_GRAFT_CPUS","8")
import pyarrow as pa
import pyarrow.parquet as pq
src = "/root/testdata/sf0.001"
sf = tempfile.mkdtemp(prefix="sf_uni_")
for t in ("region","nation","customer","supplier","part","orders","lineitem","events","embeddings"):
    shutil.copy(f"{src}/{t}.parquet", sf)
texts = [
    "漢字テキストに空白なし続くテキスト",                  # CJK, no spaces
    "emoji 👨‍👩‍👧‍👦 text 🎉 done",                        # ZWJ family + emoji
    "café résumé naive",               # combining acute
    "İstanbul DİYARBAKIR ılık IŞIK",                     # Turkish I forms
    "word nbsp separated here",                # NBSP separators
    "wide　ideographic　space",                  # U+3000
    "نص عربي من اليمين إلى اليسار",                      # RTL Arabic
    "Mixed 漢字 and عربي and 🎉 and ascii",              # mixed scripts
]
rows = list(zip(range(910001, 910001+len(texts)), texts))
d = pq.read_table(f"{src}/documents.parquet")
extra = pa.table({
    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
    "text": pa.array([r[1] for r in rows], pa.string()),
    "lang": pa.array(["xx"]*len(rows), pa.string()),
    "source": pa.array(["uni"]*len(rows), pa.string()),
    "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
})
d2 = pa.concat_tables([pa.table({c: d[c] for c in extra.column_names}), extra])
pq.write_table(d2, f"{sf}/documents.parquet")

from sanctum_spark.session import get_spark
import sanctum_spark.queries as qreg
qreg.load_all_modules()
import duckdb
spark = get_spark("uni_sweep")
results = {}
for name, q in qreg.REGISTRY.items():
    try:
        got = q.fn(spark, sf).toPandas()
        spark_err = None
    except Exception as ex:
        got, spark_err = None, f"{type(ex).__name__}: {str(ex)[:140]}"
    oracle_err, want = None, None
    if q.oracle:
        try:
            con = duckdb.connect()
            for t in ("region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
            want = con.sql(q.oracle).df()
        except Exception as ex:
            oracle_err = f"{type(ex).__name__}: {str(ex)[:140]}"
    status = "ok"
    if spark_err: status = "SPARK_CRASH"
    elif oracle_err: status = "ORACLE_ERR"
    elif want is not None:
        def canon(df):
            df = df.reindex(sorted(df.columns), axis=1).astype(str)
            return df.sort_values(by=list(df.columns)).reset_index(drop=True) if len(df) else df.reset_index(drop=True)
        try:
            status = "match" if canon(got).equals(canon(want)) else f"MISMATCH({len(got)}vs{len(want)})"
        except Exception as ex:
            status = f"compare_err:{str(ex)[:60]}"
    results[name] = {"status": status, "spark_err": spark_err, "oracle_err": oracle_err}
bad = {k:v for k,v in results.items() if v["status"] not in ("match","ok")}
print(json.dumps(bad, indent=1))
print("summary:", len(results), "queries;", sum(1 for v in results.values() if v['status']=='match'), "match;", len(bad), "problems")
print("sf:", sf)
