#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: compare Verify output
parquet against DuckDB running the declared oracle SQL on the same tables.

Usage: python3 tools/selfcheck.py [sfDir] [outDir]
(Dev tool only — the engine itself is pure Scala/Spark.)
"""
import json, sys, glob

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle_sql = json.load(open(f"{OUT}/oracle_sql.json"))

ok, bad = [], []
for name, sql in sorted(oracle_sql.items()):
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        bad.append((name, "NO SPARK OUTPUT"))
        continue
    try:
        ours = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
        theirs = con.sql(sql).df()
    except Exception as e:
        bad.append((name, f"ORACLE ERROR: {str(e)[:300]}"))
        continue
    ours = ours.reindex(sorted(ours.columns), axis=1)
    theirs = theirs.reindex(sorted(theirs.columns), axis=1)
    if list(ours.columns) != list(theirs.columns):
        bad.append((name, f"COLUMNS: ours={list(ours.columns)} oracle={list(theirs.columns)}"))
        continue
    if len(ours) != len(theirs):
        bad.append((name, f"ROWS: ours={len(ours)} oracle={len(theirs)}"))
        continue
    o = ours.sort_values(by=list(ours.columns)).reset_index(drop=True)
    t_ = theirs.sort_values(by=list(theirs.columns)).reset_index(drop=True)
    # dtype harmonization (int32 vs int64 etc. is a real schema mismatch we
    # want to see, so only compare values after checking dtype names)
    dt_ours = [str(x) for x in o.dtypes]
    dt_th = [str(x) for x in t_.dtypes]
    if dt_ours != dt_th:
        bad.append((name, f"DTYPES: ours={dt_ours} oracle={dt_th}"))
        continue
    if o.equals(t_):
        ok.append(name)
    else:
        neq = (o != t_) & ~(o.isna() & t_.isna())
        cols = [c for c in o.columns if neq[c].any()]
        detail = []
        for c in cols[:3]:
            i = neq[c].idxmax()
            detail.append(f"{c}[{i}]: {o[c][i]!r} vs {t_[c][i]!r}")
        bad.append((name, f"VALUES differ in {cols}: " + "; ".join(detail)))

print(f"== {len(ok)} MATCH, {len(bad)} MISMATCH ==")
for n in ok:
    print(f"  OK   {n}")
for n, why in bad:
    print(f"  FAIL {n}: {why}")
sys.exit(1 if bad else 0)
