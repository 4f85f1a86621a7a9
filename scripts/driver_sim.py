"""Simulate the external driver: vanilla session, import __spark_entry__ by
path, run entry() + every queries()[name] vs oracle_sql()[name] via DuckDB."""
import importlib.util, sys, time
import duckdb
from pyspark.sql import SparkSession

# vanilla session — deliberately NONE of our engine confs
spark = (SparkSession.builder.master("local[8]")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

df = mod.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, cols={df.columns}")
assert len(rows) > 0

qs, os_ = mod.queries(), mod.oracle_sql()
print(f"queries={len(qs)} oracles={len(os_)}")

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')")

import datetime, math
def canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v + 0.0
    if isinstance(v, datetime.datetime): return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date): return v.isoformat()
    if isinstance(v, (list, tuple)): return tuple(canon(x) for x in v)
    return v

fails = []
t0 = time.time()
for name, builder in qs.items():
    try:
        sdf = builder(spark, "/root/testdata/sf0.01")
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in os_:
            print(f"[rows-only] {name}: {len(srows)} rows"); continue
        rel = con.execute(os_[name])
        dcols = [d[0] for d in rel.description]; drows = rel.fetchall()
        order_s = sorted(range(len(scols)), key=lambda i: scols[i])
        order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
        cs = sorted([tuple(canon(r[i]) for i in order_s) for r in srows], key=repr)
        cd = sorted([tuple(canon(r[i]) for i in order_d) for r in drows], key=repr)
        ok = sorted(scols) == sorted(dcols) and cs == cd
        if not ok:
            fails.append(name)
            print(f"[FAIL] {name} cols_eq={sorted(scols)==sorted(dcols)} rows {len(cs)}/{len(cd)}")
        else:
            print(f"[OK] {name} ({len(cs)})")
    except Exception as e:
        fails.append(name); print(f"[ERR] {name}: {type(e).__name__}: {str(e)[:150]}")
print(f"\nDONE {len(qs)-len(fails)}/{len(qs)} in {time.time()-t0:.0f}s; fails={fails}")
