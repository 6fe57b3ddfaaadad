"""Registry sweep over sf0.001 augmented with degenerate rows: NULL
text, empty text, whitespace-only text, NULL numerics, NULL event
props/values. Compares oracle-paired queries driver-style."""
import os, json, tempfile, shutil
os.environ.setdefault("SPARK_GRAFT_CPUS","8")
import pyarrow as pa
import pyarrow.parquet as pq
src = "/root/testdata/sf0.001"
sf = tempfile.mkdtemp(prefix="sf_null_")  # degenerate-row copy of sf0.001
for t in ("region","nation","customer","supplier","part","orders","lineitem","embeddings"):
    shutil.copy(f"{src}/{t}.parquet", sf)
# documents + degenerate rows
d = pq.read_table(f"{src}/documents.parquet")
extra = pa.table({
    "doc_id": pa.array([900001, 900002, 900003], pa.int64()),
    "text": pa.array([None, "", "   "], pa.string()),
    "lang": pa.array(["en", None, "xx"], pa.string()),
    "source": pa.array(["s_null", "s_empty", None], pa.string()),
    "n_chars": pa.array([0, 0, 3], pa.int64()),
})
d2 = pa.concat_tables([pa.table({c: d[c] for c in extra.column_names}), extra])
pq.write_table(d2, f"{sf}/documents.parquet")
# events + degenerate rows (value NULL not allowed? schema nullable)
e = pq.read_table(f"{src}/events.parquet")
eextra = pa.table({
    "event_id": pa.array([9900001, 9900002], pa.int64()),
    "ts": pa.array([pa.scalar(1700000000000000000, pa.timestamp("ns")).as_py()]*2, e["ts"].type),
    "user_id": pa.array([990001, None], pa.int64()),
    "event_type": pa.array([None, "view"], pa.string()),
    "value": pa.array([None, 1.0], pa.float64()),
    "props": pa.array([None, "not json"], pa.string()),
})
e2 = pa.concat_tables([pa.table({c: e[c] for c in eextra.column_names}), eextra])
pq.write_table(e2, f"{sf}/events.parquet")

from sanctum_spark.session import get_spark
import sanctum_spark.queries as qreg
qreg.load_all_modules()
import duckdb
spark = get_spark("null_sweep")
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
print("summary:", len(results), "queries;", sum(1 for v in results.values() if v['status']=='match'), "match;", sum(1 for v in results.values() if v['status']=='ok'), "rows-only ok;", len(bad), "problems")
print("sf:", sf)
