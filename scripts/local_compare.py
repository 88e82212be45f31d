#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

For each <name> directory under the Verify outDir: load the Spark parquet,
run the matching oracle SQL in DuckDB over the sf tables, sort columns by
name and rows by all values, and compare cell-by-cell (NaN == NaN).

Usage:
  python3 scripts/local_compare.py <sf_dir> <verify_out_dir> [name ...]

Driver-side tooling only (duckdb/pandas are not dependencies of the Scala
library).
"""
import duckdb, glob, json, math, os, sys

sf = sys.argv[1]
out = sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
con.execute("SET threads TO 8")
for p in glob.glob(f"{sf}/*.parquet"):
    t = os.path.basename(p).replace(".parquet", "")
    # driver SFs ship one file per table; ScaleData SFs ship a DIRECTORY
    # of splits per table — glob inside in that case
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

oracles = json.load(open(f"{out}/oracle_sql.json"))

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def cells_equal(a, b):
    if a is b:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    return a == b

fails = 0
for name in sorted(oracles):
    if only and name not in only:
        continue
    d = f"{out}/{name}"
    if not os.path.isdir(d):
        print(f"{name}: MISSING spark output")
        fails += 1
        continue
    spark_df = con.execute(
        f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
    try:
        ora_df = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}")
        fails += 1
        continue
    sc, oc = sorted(spark_df.columns), sorted(ora_df.columns)
    if sc != oc:
        print(f"{name}: SCHEMA mismatch spark={sc} oracle={oc}")
        fails += 1
        continue
    if len(spark_df) != len(ora_df):
        print(f"{name}: ROWS mismatch spark={len(spark_df)} oracle={len(ora_df)}")
        fails += 1
        continue
    s, o = norm(spark_df), norm(ora_df)
    bad = None
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not cells_equal(a, b):
                bad = (col, i, a, b)
                break
        if bad:
            break
    if bad:
        print(f"{name}: VALUE mismatch col={bad[0]} row={bad[1]} "
              f"spark={bad[2]!r} oracle={bad[3]!r}")
        fails += 1
    else:
        print(f"{name}: OK ({len(spark_df)} rows)")
sys.exit(1 if fails else 0)
