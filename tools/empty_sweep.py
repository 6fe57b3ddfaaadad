"""Full-registry empty-input sweep: builds a zero-row copy of every
table schema and runs all registered queries against it, comparing
oracle-paired ones driver-style.  Round-6 evidence tool — the fast
regression core lives in tests/test_empty_input.py.

Usage: PYTHONPATH=. python tools/empty_sweep.py
"""
import os, json, tempfile
import pyarrow as pa
import pyarrow.parquet as pq
os.environ.setdefault("SPARK_GRAFT_CPUS","8")
from sanctum_spark.session import get_spark
import sanctum_spark.queries as qreg
qreg.load_all_modules()
import duckdb
spark = get_spark("empty_sweep")
src = os.environ.get("SANCTUM_TEST_SF_DIR", "/root/testdata/sf0.001")
sf = tempfile.mkdtemp(prefix="sf_empty_")
for t in ("region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"):
    schema = pq.read_schema(f"{src}/{t}.parquet")
    schema = pa.schema([schema.field(i) for i in range(len(schema.names))])
    pq.write_table(schema.empty_table(), f"{sf}/{t}.parquet")
results = {}
for name, q in qreg.REGISTRY.items():
    try:
        got = q.fn(spark, sf).toPandas()
        spark_err = None
    except Exception as e:
        got = None
        spark_err = f"{type(e).__name__}: {str(e)[:120]}"
    oracle_err = None
    want = None
    if q.oracle:
        try:
            con = duckdb.connect()
            for t in ("region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
            want = con.sql(q.oracle).df()
        except Exception as e:
            oracle_err = f"{type(e).__name__}: {str(e)[:120]}"
    status = "ok"
    if spark_err: status = "SPARK_CRASH"
    elif oracle_err: status = "oracle_err"
    elif want is not None:
        def canon(df):
            df = df.reindex(sorted(df.columns), axis=1).astype(str)
            return df.sort_values(by=list(df.columns)).reset_index(drop=True) if len(df) else df.reset_index(drop=True)
        try:
            status = "match" if canon(got).equals(canon(want)) else f"MISMATCH({len(got)}vs{len(want)})"
        except Exception as e:
            status = f"compare_err:{str(e)[:60]}"
    results[name] = {"status": status, "spark_err": spark_err, "oracle_err": oracle_err}
bad = {k:v for k,v in results.items() if v["status"] not in ("match","ok")}
print(json.dumps(bad, indent=1))
print("summary:", len(results), "queries;", sum(1 for v in results.values() if v['status']=='match'), "match;", sum(1 for v in results.values() if v['status']=='ok'), "rows-only ok;", len(bad), "problems")
