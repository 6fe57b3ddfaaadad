"""Registry sweep: sf0.001 events augmented with extreme rows —
negative values, huge magnitudes, far-future and pre-epoch timestamps."""
import os, json, tempfile, shutil
os.environ.setdefault("SPARK_GRAFT_CPUS","8")
import pyarrow as pa
import pyarrow.parquet as pq
import pandas as pd
src = "/root/testdata/sf0.001"
sf = tempfile.mkdtemp(prefix="sf_ext_")
for t in ("region","nation","customer","supplier","part","orders","lineitem","documents","embeddings"):
    shutil.copy(f"{src}/{t}.parquet", sf)
e = pq.read_table(f"{src}/events.parquet")
ts_type = e["ts"].type
def ts(s): return pd.Timestamp(s).to_pydatetime()
rows = [
    (9910001, ts("2024-01-01"), 991001, "view", -5.5, "{}"),        # negative value
    (9910002, ts("2024-01-01"), 991001, "view", -1e12, "{}"),       # huge negative
    (9910003, ts("2024-01-01"), 991002, "purchase", 1e15, "{}"),    # huge positive
    (9910004, ts("2262-01-01"), 991003, "view", 1.0, "{}"),         # far future (within ns-epoch range)
    (9910005, ts("1969-12-30"), 991004, "click", 2.0, "{}"),        # pre-epoch
    (9910006, ts("1901-06-15"), 991004, "view", 3.0, "{}"),         # deep pre-epoch
]
extra = pa.table({
    "event_id": pa.array([r[0] for r in rows], pa.int64()),
    "ts": pa.array([r[1] for r in rows], ts_type),
    "user_id": pa.array([r[2] for r in rows], pa.int64()),
    "event_type": pa.array([r[3] for r in rows], pa.string()),
    "value": pa.array([float(r[4]) for r in rows], pa.float64()),
    "props": pa.array([r[5] for r in rows], pa.string()),
})
e2 = pa.concat_tables([pa.table({c: e[c] for c in extra.column_names}), extra])
pq.write_table(e2, f"{sf}/events.parquet")

from sanctum_spark.session import get_spark
import sanctum_spark.queries as qreg
qreg.load_all_modules()
import duckdb
spark = get_spark("ext_sweep")
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
