#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Mirrors the documented driver behavior: for each query, read the Spark
parquet result, run the oracle SQL in DuckDB over the testdata tables,
sort columns by name, sort rows, and compare stringified cell values.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
# Pin the session TZ to match Spark's spark.sql.session.timeZone=UTC —
# CAST(ts AS DATE)/date_trunc on TIMESTAMPTZ parquet reads are TZ-sensitive.
con.execute("SET TimeZone='UTC'")
for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(f)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    s = df.astype(str)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    return s

fails = 0
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        continue
    spark_df = con.execute(
        f"SELECT * FROM read_parquet('{path}/*.parquet')").df()
    if name not in oracle:
        print(f"{name:24s} NO_ORACLE  spark_rows={len(spark_df)}")
        continue
    try:
        o_df = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name:24s} ORACLE_ERR {e}")
        fails += 1
        continue
    rows_ok = len(spark_df) == len(o_df)
    schema_ok = sorted(map(str.lower, spark_df.columns)) == sorted(map(str.lower, o_df.columns))
    # case-insensitive col align: lower both
    spark_df.columns = [c.lower() for c in spark_df.columns]
    o_df.columns = [c.lower() for c in o_df.columns]
    hash_ok = False
    detail = ""
    if rows_ok and schema_ok:
        a, b = canon(spark_df), canon(o_df)
        hash_ok = a.equals(b)
        if not hash_ok:
            neq = (a != b)
            bad_cols = [c for c in a.columns if neq[c].any()]
            for c in bad_cols[:2]:
                i = neq[c].idxmax()
                detail += f" col={c} spark={a[c][i]!r} oracle={b[c][i]!r}"
            # dtype hints
            detail += f" | dtypes spark={dict(spark_df.dtypes.astype(str))} oracle={dict(o_df.dtypes.astype(str))}" if bad_cols else ""
    status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
    if status == "FAIL":
        fails += 1
        print(f"{name:24s} FAIL rows={rows_ok}({len(spark_df)}/{len(o_df)}) schema={schema_ok} hash={hash_ok}{detail}")
        if not schema_ok:
            print(f"    spark cols: {sorted(spark_df.columns)}")
            print(f"    oracle cols: {sorted(o_df.columns)}")
    else:
        print(f"{name:24s} OK   rows={len(spark_df)}")
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
