#!/usr/bin/env python3
"""10x bench stress corpus (target/sf1) — statistically matched to the
driver's /root/testdata/sf0.1 gate corpus, seeded, committed (SURVEY §5:
every stress generator ships with the repo so artifacts are reproducible).
Bench-only input — NEVER an oracle table.

Matching strategy: key columns are fresh 10x ranges; non-key columns are
joint bootstrap draws from the sf0.1 rows (so marginals AND cross-column
structure match by construction); structured tables (documents, events,
embeddings) re-run the gate corpus's visible generative recipe at 10x
(closed 30-word vocab, ~4.8% near-dup / ~0.2% exact-dup plants marked with
a 'dup' token, 30-day event window at 10x density with 10x users at the
same per-user activity, unit-norm near-uniform embeddings at 4x).

Row groups: 65,536 rows — the round-12 lesson (etl_rowgroup_audit): a
single-row-group file caps every scan at ONE task; multi-row-group files
scan cluster-wide.

Usage: python3 tools/gen_sf1.py   (writes target/sf1/*.parquet)
"""
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = "/root/repo/target/sf1"
RG = 65536
os.makedirs(OUT, exist_ok=True)

rng = np.random.default_rng(13)


def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet", row_group_size=RG)
    print(name, table.num_rows)


# region / nation: fixed dimension tables — copy verbatim
for t in ("region", "nation"):
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
    print(t, "copied")


def boot(src_table, cols, n):
    """Joint bootstrap: n row-draws (with replacement) of `cols`."""
    idx = rng.integers(0, src_table.num_rows, n)
    return {c: src_table[c].combine_chunks().take(pa.array(idx)) for c in cols}


# ---- customer 150k ----------------------------------------------------
src = pq.read_table(f"{SRC}/customer.parquet")
N = 150000
b = boot(src, ["c_nationkey", "c_acctbal", "c_mktsegment"], N)
write("customer", pa.table({
    "c_custkey": pa.array(np.arange(N), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(N)],
    "c_nationkey": b["c_nationkey"], "c_acctbal": b["c_acctbal"],
    "c_mktsegment": b["c_mktsegment"]}))

# ---- supplier 10k -----------------------------------------------------
src = pq.read_table(f"{SRC}/supplier.parquet")
N = 10000
b = boot(src, ["s_nationkey", "s_acctbal"], N)
write("supplier", pa.table({
    "s_suppkey": pa.array(np.arange(N), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(N)],
    "s_nationkey": b["s_nationkey"], "s_acctbal": b["s_acctbal"]}))

# ---- part 200k --------------------------------------------------------
src = pq.read_table(f"{SRC}/part.parquet")
N = 200000
b = boot(src, ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"], N)
write("part", pa.table({"p_partkey": pa.array(np.arange(N), pa.int64()),
                        **{c: b[c] for c in b}}))

# ---- orders 1.5M ------------------------------------------------------
src = pq.read_table(f"{SRC}/orders.parquet")
N_ORD = 1500000
b = boot(src, ["o_orderstatus", "o_totalprice", "o_orderdate",
               "o_orderpriority"], N_ORD)
write("orders", pa.table({
    "o_orderkey": pa.array(np.arange(N_ORD), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, 150000, N_ORD), pa.int64()),
    **{c: b[c] for c in b}}))

# ---- lineitem ~6M (per-order fan sampled from the gate fan dist) ------
src = pq.read_table(f"{SRC}/lineitem.parquet")
ok = src["l_orderkey"].to_numpy()
_, fan_counts = np.unique(ok, return_counts=True)
fans = rng.choice(fan_counts, N_ORD)          # empirical lines-per-order
N = int(fans.sum())
b = boot(src, ["l_linenumber", "l_quantity", "l_extendedprice",
               "l_discount", "l_tax", "l_returnflag", "l_linestatus",
               "l_shipdate"], N)
write("lineitem", pa.table({
    "l_orderkey": pa.array(np.repeat(np.arange(N_ORD), fans), pa.int64()),
    "l_partkey": pa.array(rng.integers(0, 200000, N), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, 10000, N), pa.int64()),
    **{c: b[c] for c in b}}))

# ---- events 1M: same 30-day window at 10x density, 10x users ----------
src = pq.read_table(f"{SRC}/events.parquet")
N = 1000000
uid = src["user_id"].to_numpy()
_, per_user = np.unique(uid, return_counts=True)   # gate activity dist
n_users = 15000
acts = rng.choice(per_user, n_users)
# trim/pad to exactly N rows while keeping the activity shape
users = np.repeat(np.arange(n_users), acts)
if len(users) >= N:
    users = rng.permutation(users)[:N]
else:
    users = np.concatenate([users, rng.integers(0, n_users, N - len(users))])
t0 = np.datetime64("2024-01-01T00:00:00.000000")
span_us = 30 * 86400 * 1000000
ts = np.sort(rng.integers(0, span_us, N))
b = boot(src, ["event_type", "value"], N)
write("events", pa.table({
    "event_id": pa.array(np.arange(N), pa.int64()),
    "ts": pa.array(t0 + ts.astype("timedelta64[us]"),
                   pa.timestamp("us")),
    "user_id": pa.array(rng.permutation(users), pa.int64()),
    "event_type": b["event_type"], "value": b["value"],
    "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, N)]}))

# ---- documents 50k: closed 30-word vocab + dup plants -----------------
VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "customer", "sort", "order", "slow", "line", "part", "fast", "the",
         "row", "agg", "key", "query", "a", "scan", "batch"]
N = 50000
langs = ["en"] * 41 + ["zh"] * 15 + ["fr"] * 15 + ["es"] * 15 + ["de"] * 14
texts, lang_col, src_col = [], [], []
for i in range(N):
    r = rng.random()
    if i > 10 and r < 0.048:          # near-dup plant: mutate an earlier doc
        j = int(rng.integers(0, i))
        toks = texts[j].split(" ")
        for _ in range(int(rng.integers(1, 4))):
            toks[int(rng.integers(0, len(toks)))] = "dup"
        texts.append(" ".join(toks))
        lang_col.append(lang_col[j]); src_col.append(src_col[j])
    elif i > 10 and r < 0.050:        # exact dup plant
        j = int(rng.integers(0, i))
        texts.append(texts[j])
        lang_col.append(lang_col[j]); src_col.append(src_col[j])
    else:
        n = int(rng.integers(10, 101))
        texts.append(" ".join(np.array(VOCAB)[rng.integers(0, len(VOCAB), n)]))
        lang_col.append(langs[int(rng.integers(0, len(langs)))])
        src_col.append(f"src{int(rng.integers(0, 20))}")
write("documents", pa.table({
    "doc_id": pa.array(range(N), pa.int64()), "text": texts,
    "lang": lang_col, "source": src_col,
    "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

# ---- embeddings 8000 (4x): unit-norm near-uniform, 10 labels ----------
N = 8000
m = rng.standard_normal((N, 64))
m = (m / np.linalg.norm(m, axis=1, keepdims=True)).astype(np.float32)
write("embeddings", pa.table({
    "vec_id": pa.array(np.arange(N), pa.int64()),
    "embedding": pa.array([r for r in m.tolist()],
                          pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, N), pa.int32())}))
