#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare with the Spark parquet dumps
produced by graft.Verify (sorted columns, sorted rows, value-level compare)."""
import json, sys, glob, math
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            try: df[c] = df[c].astype("int64")
            except Exception: df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"{name}: MISSING spark output"); fails += 1; continue
    try:
        duck = con.execute(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
    spark = pd.concat([pd.read_parquet(f) for f in spark_files])
    try:
        a, b = canon(spark.copy()), canon(duck.copy())
    except Exception as e:
        print(f"{name}: CANON ERROR: {e}"); fails += 1; continue
    if list(a.columns) != list(b.columns):
        print(f"{name}: SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}"); fails += 1; continue
    if len(a) != len(b):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"); fails += 1; continue
    if not a.equals(b):
        neq = (a != b).any(axis=1)
        print(f"{name}: VALUE MISMATCH ({neq.sum()}/{len(a)} rows)")
        print("  spark:", a[neq].head(3).to_dict("records"))
        print("  duck :", b[neq].head(3).to_dict("records"))
        fails += 1; continue
    print(f"{name}: OK ({len(a)} rows)")

# every SparkEntry query now carries a full DuckDB oracle (round 4): any
# dumped query directory without an oracle entry is a gate failure, not a
# silently-weaker rows-only check
import os
dumped = {os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)}
for n in sorted(dumped - set(oracle)):
    print(f"{n}: NO ORACLE ENTRY"); fails += 1

sys.exit(1 if fails else 0)
