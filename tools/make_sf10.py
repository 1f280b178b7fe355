#!/usr/bin/env python3
"""Build a 10x scale-check dataset from sf0.1 (dev tool, driver-side):
each table is 10 key-shifted copies so intra-copy joins stay consistent.
Document texts get a per-copy marker token so the corpus is 10x DISTINCT
docs (operator scale), not 10 identical copies (the pathological duplicate
corpus OpsSpec's skew test covers separately).

Usage: python3 tools/make_sf10.py [srcDir] [destDir]
"""
import os, sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "target/scratch/sf1sim"
SHIFT = 10_000_000
ID_COLS = {"doc_id", "vec_id", "event_id", "user_id"}
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
for t in TABLES:
    src = f"{SRC}/{t}.parquet"
    cols = con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
    parts = []
    for k in range(10):
        exprs = []
        for name, typ, *_ in cols:
            if name.endswith("key") or name in ID_COLS:
                exprs.append(f"CAST({name} + {k * SHIFT} AS {typ}) AS {name}")
            elif t == "documents" and name == "text":
                # per-DOC unique marker: a per-copy token would itself be a
                # hot shingle shared by every doc of the copy
                exprs.append(
                    f"text || ' u' || CAST(doc_id + {k * SHIFT} AS VARCHAR) AS text")
            else:
                exprs.append(name)
        parts.append(f"SELECT {', '.join(exprs)} FROM '{src}'")
    union = " UNION ALL ".join(parts)
    con.sql(f"COPY ({union}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT COUNT(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
