#!/usr/bin/env python3
"""Clustered-embeddings stress corpora (round 13 — VERDICT r12 Next #1).

The gate corpus's embeddings are near-uniform on the unit sphere, which
cannot produce a hot trained-IVF cell; a REAL embedding corpus is
clustered and duplicate-heavy, which can. Two realistic stressors:

 1. Mixture of Gaussians: 24 spherical clusters with Zipf sizes (the
    biggest holds ~20% of the corpus) and per-cluster spread drawn from
    [0.05, 0.30] — dense regions a density-proportional k-means seed CAN
    still resolve (seeds land where the mass is).
 2. A near-duplicate spike: 10% of the corpus is template copies
    perturbed BELOW the engine's 1e-3 quantization grain (boilerplate
    docs embed identically) — m copies of one point are indistinguishable
    to ANY quantizer, so they share a cell and pair families pay O(m^2)
    there unless a cell cap intervenes. This is the embedding analog of
    dedup's boilerplate stop-shingles.

Writes target/sfcl0.1/embeddings.parquet (2,000 vecs — gate scale) and
target/sfcl1/embeddings.parquet (8,000 vecs — 4x, the sf1 embedding
scale); the harness symlinks the remaining tables from the matching
corpus dirs. Bench/diagnostic input only — never an oracle table.
Seeds pinned; labels carry the true mixture component (templates get
label = 100 + template id) so recall/hot-cell audits can group by truth.
"""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

K = 24          # mixture components
DUP_FRAC = 0.10  # corpus fraction in the near-duplicate spike
N_TEMPLATES = 4

for N, out, seed in [(2000, "/root/repo/target/sfcl0.1", 131),
                     (8000, "/root/repo/target/sfcl1", 132)]:
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((K, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    sizes = 1.0 / np.arange(1, K + 1) ** 1.1
    sizes /= sizes.sum()
    n_dup = int(N * DUP_FRAC)
    comp = rng.choice(K, N - n_dup, p=sizes)
    spread = rng.uniform(0.05, 0.30, K)
    m = cents[comp] + spread[comp, None] * rng.standard_normal((N - n_dup, 64))
    # near-duplicate spike: copies of N_TEMPLATES points, jitter 2e-4
    # (below the 1e-3 quantization grain -> identical qv)
    tmpl = cents[rng.choice(K, N_TEMPLATES)] + 0.1 * rng.standard_normal((N_TEMPLATES, 64))
    tcomp = rng.choice(N_TEMPLATES, n_dup)
    # half the spike is BIT-EXACT copies (same doc -> same embedding
    # bytes from the same model: the exact-qv collapse case), half is
    # near-grain jitter (re-encoded floats: stays distinct to the
    # quantizer and stresses cell density instead)
    jit = np.where(rng.random(n_dup) < 0.5, 0.0, 2e-4)[:, None]
    dup = tmpl[tcomp] + jit * rng.standard_normal((n_dup, 64))
    emb = np.vstack([m, dup])
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    lab = np.concatenate([comp, 100 + tcomp])
    perm = rng.permutation(N)
    emb, lab = emb[perm].astype(np.float32), lab[perm]
    os.makedirs(out, exist_ok=True)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(N), pa.int64()),
        "embedding": pa.array([r for r in emb.tolist()], pa.list_(pa.float32())),
        "label": pa.array(lab, pa.int32())}), f"{out}/embeddings.parquet")
    big = np.bincount(lab[lab < 100], minlength=K).max()
    print(out, N, "hot mixture comp:", big, "dup spike:", n_dup)
