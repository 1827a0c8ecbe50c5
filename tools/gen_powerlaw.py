#!/usr/bin/env python3
"""Power-law co-purchase stress corpora (round 14 — VERDICT r13 Next #1).

The gate corpus's co-purchase graph is tame (max degree 6-13, sum deg^2
~10-34k), so the wedge-join graph family (graph_triangles,
graph_clustering_coeff, graph_adamic_adar, graph_link_predict,
graph_reach_2hop) has never been stressed on the degree structure a REAL
product graph has: Zipf-popular parts become hubs, and wedge work is
sum deg^2 — quadratic in the hottest degree. This generator builds the
falsifier: orders draw their parts from a Zipf(1.1) catalog, so the
rank-1 part co-occurs (support >= 2) with thousands of others and the
hub's deg^2 dominates every wedge enumeration.

Writes target/sfpl0.1/lineitem.parquet (60k orders x 4 lines = 240k
rows) and target/sfpl1/lineitem.parquet (240k orders = 960k rows — 4x).
Part ids are PERMUTED so id order is independent of degree order (an
id-oriented wedge join can't accidentally benefit from the hub having a
low id). Bench/diagnostic input only — never an oracle table. Seeds
pinned; prints the derived co-purchase degree profile so the artifact
is self-describing.

Usage: python3 tools/gen_powerlaw.py   (writes target/sfpl{0.1,1}/)
"""
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

P = 20000       # part catalog (fixed across scales: density grows with N)
ALPHA = 1.1     # Zipf exponent of part popularity
L = 4           # lines per order
RG = 65536      # row-group size (multi-row-group scan lesson, round 12)

for n_orders, out, seed in [(60000, "/root/repo/target/sfpl0.1", 141),
                            (240000, "/root/repo/target/sfpl1", 142)]:
    rng = np.random.default_rng(seed)
    w = 1.0 / np.arange(1, P + 1) ** ALPHA
    w /= w.sum()
    ids = rng.permutation(P).astype(np.int64) + 1  # rank -> shuffled part id
    draw = rng.choice(P, size=(n_orders, L), p=w)
    orderkey = np.repeat(np.arange(1, n_orders + 1, dtype=np.int64), L)
    partkey = ids[draw.ravel()]
    suppkey = rng.integers(1, 1000, n_orders * L, dtype=np.int64)
    os.makedirs(out, exist_ok=True)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(orderkey, pa.int64()),
        "l_partkey": pa.array(partkey, pa.int64()),
        "l_suppkey": pa.array(suppkey, pa.int64()),
    }), f"{out}/lineitem.parquet", row_group_size=RG)
    prof = duckdb.connect().execute(f"""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM read_parquet('{out}/lineitem.parquet')),
        e AS (SELECT a.l_partkey pa, b.l_partkey pb FROM li a JOIN li b
              ON a.l_orderkey=b.l_orderkey AND a.l_partkey<b.l_partkey
              GROUP BY 1,2 HAVING COUNT(*)>=2),
        deg AS (SELECT u, COUNT(*) deg FROM
                (SELECT pa u FROM e UNION ALL SELECT pb FROM e) GROUP BY 1)
        SELECT COUNT(*), (SELECT COUNT(*) FROM e), MAX(deg),
               quantile_cont(deg,0.99), SUM(deg*deg),
               SUM(CASE WHEN deg>64 THEN 1 ELSE 0 END) FROM deg""").fetchone()
    print(f"{out}: rows={n_orders*L} nodes={prof[0]} edges={prof[1]} "
          f"max_deg={prof[2]} p99={prof[3]} sum_deg2={prof[4]} hubs_gt64={prof[5]}")
