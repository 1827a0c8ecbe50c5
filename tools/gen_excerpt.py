#!/usr/bin/env python3
"""Excerpt-plant corpus (round 15): the falsifier for ASYMMETRIC
containment recall. The gate corpus's near-dup plants mutate tokens in
place (sizes stay ~equal), so no gate pair ever has a size ratio >= 2 —
the exact case dedup_containment_ensemble exists for. Here 10% of docs
are EXCERPTS: a contiguous quarter-to-half token slice of a (longer)
earlier doc, so shingle containment of the excerpt in its source is
~1 while Jaccard is ~len_ratio (0.1-0.5) — below the 2-row band index's
reliable-collision range at the low end. Open 5k-word Zipf vocabulary
(so shingles are informative, not saturated). Writes
target/sfex0.1/documents.parquet (5000 docs, seeded). Diagnostic
input only — never an oracle table.

Usage: python3 tools/gen_excerpt.py
"""
import os
import numpy as np, pyarrow as pa, pyarrow.parquet as pq

V = 5000
rngv = np.random.default_rng(17)
lengths = np.clip((1.2 * np.log(np.arange(V) + 2)).astype(int) + 2, 2, 14)
letters = np.array(list('abcdefghijklmnopqrstuvwxyz'))
words, seen = [], set()
for r in range(V):
    while True:
        w = ''.join(rngv.choice(letters, lengths[r]))
        if w not in seen:
            seen.add(w); words.append(w); break
words = np.array(words)
p = 1.0 / np.arange(1, V + 1) ** 1.05
p /= p.sum()

N, out = 5000, '/root/repo/target/sfex0.1'
rng = np.random.default_rng(46)
langs = ['en'] * 41 + ['zh'] * 15 + ['fr'] * 15 + ['es'] * 15 + ['de'] * 14
texts, lang_col, src_col, is_ex = [], [], [], []
for i in range(N):
    r = rng.random()
    toks_prev = None
    if i > 20 and r < 0.10:
        # excerpt plant: contiguous 25-50% slice of a longer earlier doc
        for _ in range(20):
            j = int(rng.integers(0, i))
            tp = texts[j].split(' ')
            if len(tp) >= 40 and not is_ex[j]:
                toks_prev = tp; break
    if toks_prev is not None:
        frac = rng.uniform(0.25, 0.5)
        m = max(8, int(len(toks_prev) * frac))
        start = int(rng.integers(0, len(toks_prev) - m + 1))
        texts.append(' '.join(toks_prev[start:start + m]))
        lang_col.append(lang_col[j]); src_col.append(src_col[j]); is_ex.append(True)
    else:
        n = int(rng.integers(40, 121))
        texts.append(' '.join(words[rng.choice(V, n, p=p)]))
        lang_col.append(langs[int(rng.integers(0, len(langs)))])
        src_col.append(f"src{int(rng.integers(0, 20))}"); is_ex.append(False)
os.makedirs(out, exist_ok=True)
pq.write_table(pa.table({
    'doc_id': pa.array(range(N), pa.int64()), 'text': texts,
    'lang': lang_col, 'source': src_col,
    'n_chars': pa.array([len(t) for t in texts], pa.int64())}),
    f'{out}/documents.parquet')
print(out, N, 'excerpts:', sum(is_ex))
