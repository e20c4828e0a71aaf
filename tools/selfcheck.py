#!/usr/bin/env python3
"""Dev-only self-check replicating the driver's DuckDB-oracle compare:
for each query, read Spark's parquet output and run the oracle SQL in
DuckDB over the same testdata; sort columns by name, sort rows, and
compare values. NOT part of the shipped engine (driver-side python).

Usage: tools/selfcheck.py [sfDir] [verifyOutDir]
"""
import sys, json, glob, math
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # decimals -> canonical string; bytes -> hex
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df

def cmp(a: pd.DataFrame, b: pd.DataFrame):
    if sorted(a.columns) != sorted(b.columns):
        return False, f"columns differ: spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return False, f"row counts differ: spark={len(a)} oracle={len(b)}"
    a, b = norm(a), norm(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype).startswith("float"):
            ok = ((av.isna() & bv.isna()) | (av == bv) |
                  ((av - bv).abs() <= 1e-12 * (av.abs() + bv.abs() + 1))).all()
        else:
            ok = ((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str))).all()
        if not ok:
            bad = (~((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str)))).idxmax()
            return False, f"col {c} row {bad}: spark={av[bad]!r} oracle={bv[bad]!r} (dtypes {av.dtype}/{bv.dtype})"
    return True, "ok"

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    ok, msg = cmp(spark_df, duck_df)
    print(("PASS" if ok else "FAIL") + f" {name}: {msg}")
    fails += 0 if ok else 1
print(f"\n{len(oracle)-fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
