#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Reads each <outDir>/<name> parquet written by graft.Verify, runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the testdata
parquet tables (registered under their bare names), sorts columns by
name and rows by all columns, and compares exactly. This is a local
iteration tool only; the driver runs its own equivalent.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
errpath = f"{out}/errors.json"
if os.path.exists(errpath):
    for name, err in sorted(json.load(open(errpath)).items()):
        print(f"FAIL {name}: query threw {err}")
        fails += 1
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {str(e).splitlines()[0]}"); fails += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: cols spark={list(got.columns)} oracle={list(want.columns)}")
        fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
        fails += 1; continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    # normalize dtypes (e.g. int32 vs int64) before exact compare
    for c in g.columns:
        try:
            w[c] = w[c].astype(g[c].dtype)
        except Exception:
            pass
    eq = g.equals(w)
    if not eq:
        diff = (g != w) & ~(g.isna() & w.isna())
        ncell = int(diff.values.sum())
        print(f"FAIL {name}: {ncell} differing cells / {len(g)} rows")
        idx = diff.any(axis=1)
        print("  spark:", g[idx].head(3).to_dict("records"))
        print("  oracle:", w[idx].head(3).to_dict("records"))
        fails += 1
    else:
        print(f"OK   {name}: {len(g)} rows")
print("ALL GREEN" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
