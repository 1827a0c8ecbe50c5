#!/usr/bin/env python3
"""Crossover-validation vector corpora for the r17 adaptive quantizer.

HierSwitchN = 32768 was placed between the measured regimes (flat
fine at n <= 8k gate corpora; hier 6.8-13x ahead at 80k/256k,
growth_vecs_hier_r16.json). These two corpora bracket the switch so
the consumer-level A/B (growth_consumer_r17.sh) can confirm the
decision boundary sits on the right side of both points:

- target/sfvl24k/embeddings.parquet — 24576 vectors (adaptive: flat)
- target/sfvl48k/embeddings.parquet — 49152 vectors (adaptive: hier)

Same unit-norm near-uniform 10-label recipe as gen_decade.py /
gen_vec_saturate.py, seeds pinned. Bench/diagnostic input only —
NEVER an oracle table.

Usage: python3 tools/gen_vec_ladder_r17.py
"""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

RG = 65536
for n, name, seed in ((24576, "sfvl24k", 2417), (49152, "sfvl48k", 4817)):
    out = f"/root/repo/target/{name}"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, 64))
    m = (m / np.linalg.norm(m, axis=1, keepdims=True)).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([row for row in m.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array((np.arange(n) % 10).astype(np.int32), pa.int32()),
    }), f"{out}/embeddings.parquet", row_group_size=RG)
    print(name, n)
