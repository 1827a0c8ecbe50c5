#!/usr/bin/env python3
"""Open-vocab stress corpora (SURVEY §5, round 12): documents tables with a
Zipfian ~50k-word vocabulary, everything else matched to the gate corpus
(10-100 tokens/doc, 5-lang/20-source mix, ~4.8% near-dup plants, ~0.16%
exact dups). Bench-only input — never an oracle table.

Writes target/sfov0.1/documents.parquet (5k docs) and
target/sfov1/documents.parquet (50k docs); symlink the remaining tables
from /root/testdata/sf0.1 and target/sf1 respectively.
Round 15 adds target/sfov10 (500k docs) — the open-vocab decade probe.
"""
import os

import numpy as np, pyarrow as pa, pyarrow.parquet as pq

V = 50000
rngv = np.random.default_rng(7)
# word shapes: frequent words short, tail words long (Zipf-realistic,
# so char-level ops see organic length structure)
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

for N, out, seed in [(5000, '/root/repo/target/sfov0.1', 43),
                     (50000, '/root/repo/target/sfov1', 44),
                     # round 15 (VERDICT r14 Next #5): one more decade —
                     # the open-vocab ladder is the realistic LSH-growth
                     # probe (the closed-vocab sfdx10 saturates its 27k
                     # shingle space, so band candidates there are
                     # output-shaped true near-dups, not index behavior)
                     (500000, '/root/repo/target/sfov10', 45)]:
    rng = np.random.default_rng(seed)
    langs = ['en'] * 41 + ['zh'] * 15 + ['fr'] * 15 + ['es'] * 15 + ['de'] * 14
    doc_len = rng.integers(10, 101, N)
    pool = rng.choice(V, size=int(doc_len.sum()) + 1000, p=p)
    pi = 0
    texts, lang_col, src_col = [], [], []
    for i in range(N):
        r = rng.random()
        if i > 10 and r < 0.048:          # near-dup: mutate an earlier doc
            j = int(rng.integers(0, i))
            toks = texts[j].split(' ')
            for _ in range(int(rng.integers(1, 4))):
                toks[int(rng.integers(0, len(toks)))] = words[pool[pi]]; pi += 1
            texts.append(' '.join(toks)); lang_col.append(lang_col[j]); src_col.append(src_col[j])
        elif i > 10 and r < 0.0496:       # exact dup
            j = int(rng.integers(0, i))
            texts.append(texts[j]); lang_col.append(lang_col[j]); src_col.append(src_col[j])
        else:
            n = int(doc_len[i])
            texts.append(' '.join(words[pool[pi:pi + n]])); pi += n
            lang_col.append(langs[int(rng.integers(0, len(langs)))])
            src_col.append(f"src{int(rng.integers(0, 20))}")
    tbl = pa.table({'doc_id': pa.array(range(N), pa.int64()), 'text': texts,
                    'lang': lang_col, 'source': src_col,
                    'n_chars': pa.array([len(t) for t in texts], pa.int64())})
    os.makedirs(out, exist_ok=True)
    pq.write_table(tbl, f'{out}/documents.parquet')
    print(out, N, 'distinct words used:', len(set(w for t in texts for w in t.split())))
