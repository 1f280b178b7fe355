#!/usr/bin/env python3
"""Generate an ORGANIC sf1 dataset (10x sf0.1 row counts) with the same
schema and value domains as the driver's synthetic testdata — fresh keys
and organically distributed values, NOT key-shifted copies (that's
make_sf10.py's sf1sim). Anchors the scale-ratio claims on data whose
duplicate/cluster structure grows linearly, the way real corpora do.

Driver-side tool (numpy/pyarrow only). Usage:
  python3 tools/gen_sf1.py [destDir]   # default target/scratch/sf1
"""
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DST = sys.argv[1] if len(sys.argv) > 1 else "target/scratch/sf1"
os.makedirs(DST, exist_ok=True)
rng = np.random.default_rng(4242)

N_CUST, N_SUPP, N_PART = 150_000, 10_000, 200_000
N_ORDERS, N_EVENTS = 1_500_000, 1_000_000
N_DOCS, N_VECS, N_USERS = 50_000, 20_000, 15_000

def write(name, table):
    pq.write_table(table, f"{DST}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")

# ---- dimensions ------------------------------------------------------------
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
write("region", pa.table({
    "r_regionkey": pa.array(range(5), pa.int32()),
    "r_name": REGIONS}))
write("nation", pa.table({
    "n_nationkey": pa.array(range(25), pa.int32()),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

SEGMENTS = ["MACHINERY", "BUILDING", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD"]
write("customer", pa.table({
    "c_custkey": pa.array(range(N_CUST), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
    "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, N_CUST)]}))

write("supplier", pa.table({
    "s_suppkey": pa.array(range(N_SUPP), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2)}))

ADJ = ["large", "hot", "blue", "old", "small", "fast", "red", "new", "dim", "cold"]
NOUN = ["ring", "bolt", "plate", "cap", "pin", "rod", "disk", "gear", "tube", "clip"]
P_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
write("part", pa.table({
    "p_partkey": pa.array(range(N_PART), pa.int64()),
    "p_name": [f"{ADJ[a]} {NOUN[b]}" for a, b in
               zip(rng.integers(0, 10, N_PART), rng.integers(0, 10, N_PART))],
    "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, N_PART)],
    "p_type": [P_TYPES[i] for i in rng.integers(0, 6, N_PART)],
    "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
    "p_retailprice": np.round(900.0 + rng.uniform(0, 2000, N_PART), 2)}))

# ---- facts -----------------------------------------------------------------
STATUS = np.array(["O", "P", "F"])
PRIOS = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
epoch95 = np.datetime64("1995-01-01")
odate = (epoch95 + rng.integers(0, 2405, N_ORDERS).astype("timedelta64[D]"))
write("orders", pa.table({
    "o_orderkey": pa.array(range(N_ORDERS), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORDERS), pa.int64()),
    "o_orderstatus": STATUS[rng.integers(0, 3, N_ORDERS)],
    "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORDERS), 2),
    "o_orderdate": pa.array(odate.astype("datetime64[us]"), pa.timestamp("us")),
    "o_orderpriority": PRIOS[rng.integers(0, 5, N_ORDERS)]}))

# per-order line counts ~ 1 + Poisson(3), tail-capped like the source data
nlines = 1 + rng.poisson(3.0, N_ORDERS).clip(0, 16)
l_order = np.repeat(np.arange(N_ORDERS, dtype=np.int64), nlines)
NL = l_order.size
l_lineno = np.concatenate([np.arange(1, n + 1) for n in nlines]).astype(np.int32)
RFLAG = np.array(["R", "A", "N"])
LSTAT = np.array(["F", "O"])
sdate = (epoch95 + rng.integers(1, 2500, NL).astype("timedelta64[D]"))
write("lineitem", pa.table({
    "l_orderkey": pa.array(l_order, pa.int64()),
    "l_partkey": pa.array(rng.integers(0, N_PART, NL), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, N_SUPP, NL), pa.int64()),
    "l_linenumber": pa.array(l_lineno, pa.int32()),
    "l_quantity": rng.integers(1, 51, NL).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 105000, NL), 2),
    "l_discount": np.round(rng.uniform(0, 0.1, NL), 2),
    "l_tax": np.round(rng.uniform(0, 0.08, NL), 2),
    "l_returnflag": RFLAG[rng.integers(0, 3, NL)],
    "l_linestatus": LSTAT[rng.integers(0, 2, NL)],
    "l_shipdate": pa.array(sdate.astype("datetime64[us]"), pa.timestamp("us"))}))

ETYPES = np.array(["view", "click", "purchase", "signup", "error"])
ets = (np.datetime64("2024-01-01") +
       rng.integers(0, 30 * 86_400_000, N_EVENTS).astype("timedelta64[ms]"))
write("events", pa.table({
    "event_id": pa.array(range(N_EVENTS), pa.int64()),
    "ts": pa.array(ets.astype("datetime64[us]"), pa.timestamp("us")),
    "user_id": pa.array(rng.integers(0, N_USERS, N_EVENTS), pa.int64()),
    "event_type": ETYPES[rng.integers(0, 5, N_EVENTS)],
    "value": np.round(rng.exponential(50.0, N_EVENTS).clip(0, 600), 2),
    "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, N_EVENTS)]}))

# ---- documents: bag-of-vocab texts, organic (linear) duplicate structure ----
VOCAB = np.array([
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order", "part",
    "query", "row", "scan", "slow", "small", "sort", "spark", "stream",
    "table", "the", "value", "vector", "window"])
LANGS = np.array(["en", "zh", "es", "fr", "de"])
LANG_P = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
doc_words = rng.integers(8, 110, N_DOCS)  # ~44..580 chars at ~5.3 chars/word
texts = [" ".join(VOCAB[rng.integers(0, 31, w)]) for w in doc_words]
# ~0.2% exact duplicates (the linear rate the sf0.1 corpus carries)
for i in rng.choice(np.arange(1, N_DOCS), N_DOCS // 500, replace=False):
    texts[i] = texts[i - 1]
write("documents", pa.table({
    "doc_id": pa.array(range(N_DOCS), pa.int64()),
    "text": texts,
    "lang": LANGS[rng.choice(5, N_DOCS, p=LANG_P)],
    "source": [f"src{i}" for i in rng.integers(0, 20, N_DOCS)],
    "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

# ---- embeddings: unit-norm 64-dim, 10 soft label clusters -------------------
labels = rng.integers(0, 10, N_VECS)
means = rng.standard_normal((10, 64)).astype(np.float32)
means /= np.linalg.norm(means, axis=1, keepdims=True)
vecs = rng.standard_normal((N_VECS, 64)).astype(np.float32) + 0.8 * means[labels]
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
write("embeddings", pa.table({
    "vec_id": pa.array(range(N_VECS), pa.int64()),
    "embedding": pa.array([v for v in vecs], pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32())}))
