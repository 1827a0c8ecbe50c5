#!/usr/bin/env python3
"""Hot-key skew stress corpora (round 14 — VERDICT r13 Next #6).

agg_salted_skew and join_skew_salted prove EQUALITY with their plain
twins, but the gate corpus's key distributions are tame (user_id
near-uniform, event_type 5 values at ~20% each), so the salted plans'
VALUE has never been measured. This generator plants genuine hot keys:

 - user_id: ONE user owns 30% of all events (the agg hot key);
 - event_type: ONE type owns 85% of all events (the join hot key).

Everything else (ts, value, props, event_id) bootstraps from the gate
corpus so the non-key shape matches. Two scales: sfhk0.1 = gate-sized
(100k events), sfhk1 = 8x (800k — fresh event_ids, same key mixture),
so the skew penalty's GROWTH is measurable, not just its existence.
Bench/diagnostic input only — never an oracle table. Seeds pinned.

Usage: python3 tools/gen_hotkey.py   (writes target/sfhk{0.1,1}/)
"""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1/events.parquet"
RG = 65536
HOT_USER_FRAC = 0.30
HOT_TYPE_FRAC = 0.85

src = pq.read_table(SRC)
n0 = src.num_rows
base = {c: src.column(c).to_numpy(zero_copy_only=False) for c in src.column_names}

for mult, out, seed in [(1, "/root/repo/target/sfhk0.1", 151),
                        (8, "/root/repo/target/sfhk1", 152)]:
    rng = np.random.default_rng(seed)
    n = n0 * mult
    idx = rng.integers(0, n0, n)          # joint bootstrap of non-key cols
    user = base["user_id"][idx].copy()
    etype = base["event_type"][idx].copy()
    hot_u = rng.random(n) < HOT_USER_FRAC
    user[hot_u] = 424242                   # the 30% hot user
    hot_t = rng.random(n) < HOT_TYPE_FRAC
    etype[hot_t] = "click"                 # the 85% hot type
    os.makedirs(out, exist_ok=True)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        "ts": pa.array(base["ts"][idx]).cast(pa.timestamp("us")),
        "user_id": pa.array(user, pa.int64()),
        "event_type": pa.array(etype.astype(object), pa.string()),
        "value": pa.array(base["value"][idx], pa.float64()),
        "props": pa.array(base["props"][idx].astype(object), pa.string()),
    }), f"{out}/events.parquet", row_group_size=RG)
    u, c = np.unique(user, return_counts=True)
    t, tc = np.unique(etype, return_counts=True)
    print(f"{out}: rows={n} hot_user_share={c.max()/n:.3f} "
          f"hot_type_share={tc.max()/n:.3f} n_users={len(u)} n_types={len(t)}")
