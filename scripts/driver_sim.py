"""Simulate the external driver: vanilla session, import __spark_entry__ by
path, run entry() + every queries()[name] vs oracle_sql()[name] via DuckDB.

CANONICALIZATION FIDELITY (round-4 fix): the r3 driver red row proved the
real driver canonicalizes results with pandas ``DataFrame.sort_values``
over ALL columns — which raises ``TypeError: unhashable type: 'list'`` on
any array-typed output column. The previous sim sorted python tuples with
``key=repr`` (lists coerced to tuples first), so an array column passed
locally and died in the driver. This sim now routes BOTH result sets
through the exact driver operation — ``pandas.DataFrame(rows,
columns=cols).sort_values(by=all_cols_sorted)`` — so a driver-incompatible
schema fails HERE first.
"""
import importlib.util, sys, time
import duckdb
import pandas as pd
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

def cell(v):
    """Post-sort per-cell canonicalization (floats/dates) for comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver hashes repr-level values — compare EXACTLY (ADVICE r4:
        # a round(v, 9) here would let binary-representation drift pass
        # the sim and fail the driver; the queries' pround discipline is
        # what must make the two engines bit-identical). repr-level also
        # means -0.0 != 0.0 (r8 feature_standardize red: the old `v +
        # 0.0` collapse made this sim blinder than the driver) — keep
        # negative zero distinct via a marker, since Python -0.0 == 0.0.
        if v == 0.0 and math.copysign(1.0, v) < 0.0:
            return "\x00-0.0"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if v is None:
        return "\x00NULL"
    return v

def canon(rows, cols):
    """THE driver operation: pandas DataFrame -> sort_values(all cols).

    Raises TypeError on list/array cells exactly like the driver's
    canonicalizer — that crash IS the signal we need locally.
    """
    pdf = pd.DataFrame(rows, columns=cols)
    pdf = pdf[sorted(cols)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return [tuple(cell(v) for v in row) for row in pdf.itertuples(index=False)]

only = set(sys.argv[1:])  # optional: restrict to named queries
unknown = sorted(only - set(qs))
if unknown:  # a typo'd name must not read as an N/N green run
    raise SystemExit(f"not in the registry: {unknown}")
fails = []
t0 = time.time()
for name, builder in qs.items():
    if only and name not in only:
        continue
    try:
        sdf = builder(spark, "/root/testdata/sf0.01")
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in os_:
            # the real driver has NO rows-only mode (r1 lesson): a query
            # without an oracle is a guaranteed red row, so flag it loudly
            fails.append(name)
            print(f"[NO-ORACLE => DRIVER RED] {name}: {len(srows)} rows")
            continue
        rel = con.execute(os_[name])
        dcols = [d[0] for d in rel.description]; drows = rel.fetchall()
        cs = canon(srows, scols)
        cd = canon(drows, dcols)
        # -0.0 on EITHER side is banned outright even when both sides
        # agree: the sign of a rounds-to-zero value is summation-order
        # noise, so agreement here is a coin-flip at the driver
        # (r8 feature_standardize class).
        negz = any("\x00-0.0" in r for r in cs) or any(
            "\x00-0.0" in r for r in cd
        )
        ok = sorted(scols) == sorted(dcols) and cs == cd and not negz
        if negz:
            print(f"[NEGZERO] {name}: emits -0.0 — sign-unstable zero")
        if not ok:
            fails.append(name)
            print(f"[FAIL] {name} cols_eq={sorted(scols)==sorted(dcols)} rows {len(cs)}/{len(cd)}")
        else:
            print(f"[OK] {name} ({len(cs)})")
    except Exception as e:
        fails.append(name); print(f"[ERR] {name}: {type(e).__name__}: {str(e)[:150]}")
n_run = len(only) if only else len(qs)
print(f"\nDONE {n_run-len(fails)}/{n_run} in {time.time()-t0:.0f}s; fails={fails}")
