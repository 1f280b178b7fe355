#!/usr/bin/env python3
"""100x scale-check dataset: 10 key-shifted copies of sf1sim (which is
itself 10 copies of sf0.1) with a LARGER shift so ids never collide with
sf1sim's 0..~100M range. Same consistency/marker rules as make_sf10.py."""
import os, sys
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "target/scratch/sf1sim"
DST = sys.argv[2] if len(sys.argv) > 2 else "target/scratch/sf10sim"
SHIFT = 100_000_000
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
                exprs.append(
                    f"text || ' w' || CAST(doc_id + {k * SHIFT} AS VARCHAR) AS text")
            else:
                exprs.append(name)
        parts.append(f"SELECT {', '.join(exprs)} FROM '{src}'")
    union = " UNION ALL ".join(parts)
    con.sql(f"COPY ({union}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT COUNT(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
