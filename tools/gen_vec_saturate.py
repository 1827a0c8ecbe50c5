#!/usr/bin/env python3
"""Flat-k-ceiling-saturating vector corpus (round 16 — VERDICT r15 #2).

The r15 decade ladder (gen_decade.py, 80k vectors) forced the flat
graphK ceiling up to 32768, and the probe's conclusion was that past
~128k vectors the production answer is hierarchical assignment, not
bigger flat k. This writes the corpus that PROVES the regime split:

- target/sfvs/embeddings.parquet — 256k vectors (2x past the flat
  bind point): flat graphK clamps at 32768, so flat cells are ~8 and
  flat candidate volume goes superlinear per decade, while the
  two-level (coarse 256 x fine kf=256) key space reaches 65536
  effective cells (~4/cell) at an assignment cost of 512 centroid
  distances per row vs flat's 32768.

Same unit-norm near-uniform 10-label recipe as gen_decade.py, seed
pinned. Bench/diagnostic input only — NEVER an oracle table.

Usage: python3 tools/gen_vec_saturate.py
"""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

RG = 65536
OUT = "/root/repo/target/sfvs"
os.makedirs(OUT, exist_ok=True)
rng = np.random.default_rng(16)
N = 256000
m = rng.standard_normal((N, 64))
m = (m / np.linalg.norm(m, axis=1, keepdims=True)).astype(np.float32)
pq.write_table(pa.table({
    "vec_id": pa.array(range(N), pa.int64()),
    "embedding": pa.array([row for row in m.tolist()],
                          pa.list_(pa.float32())),
    "label": pa.array((np.arange(N) % 10).astype(np.int32), pa.int32()),
}), f"{OUT}/embeddings.parquet", row_group_size=RG)
print("embeddings", N)
