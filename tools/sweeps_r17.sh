#!/bin/bash
# r17 sweeps (VERDICT r16 Next #2/#3).
#
# Protocol change at sf1: the same shingle/text block flipped sign
# in-sweep three rounds running, and r16's adjudication showed the
# block_dedup mode (fresh JVM per alphabetical block) reproducing
# r14-level times where the single-JVM full sweep inflated them. So:
#
#  - sf0.1: classic single-JVM full sweep, RUNS=3 (directly comparable
#    to bench_local_r16_sf01_full.json).
#  - sf1:   BLOCK mode is the HEADLINE — one fresh JVM per first-token
#    block (agg_, ann_, dedup_, text_, ...), RUNS=3 inside the block,
#    per-block artifacts merged by merge_blocks_r17.py. JVM-context
#    noise cannot leak across blocks, so a block's numbers are
#    comparable to same-day isolated runs by construction.
#  - sf1 isolated re-measures for the r16 outlier set, SAME DAY, so
#    every dismissed delta carries its own raw runs (the §6 rule).
#
# All 419 registered queries are covered (the 3 r17 additions
# included). Publish-on-rc=0 guard on every artifact. One Spark JVM at
# a time; never compile while this runs.
set -u
cd /root/repo
OUT=target/sweeps_r17
mkdir -p "$OUT"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -XX:ReservedCodeCacheSize=512m"

bench() { # bench <outfile> <sfdir> <prefix...>
  local out="$1" dir="$2"; shift 2
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_RUNS=3 \
    java $AO $JOPTS -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench "$@" >"$OUT/$out.raw" 2>"$OUT/$out.err"
  local rc=$?
  if [ $rc -eq 0 ]; then mv "$OUT/$out.raw" "$OUT/$out.json"
  else rm -f "$OUT/$out.raw"; fi
  echo "done $out rc=$rc"
}

# ---- sf0.1 classic full sweep (r16-comparable) -------------------------
bench sf01_full /root/testdata/sf0.1

# ---- sf1 block sweep: fresh JVM per first-token block ------------------
# blocks derived from the registry dump (verify_full holds all 419 keys)
python3 - <<'PYEOF' > "$OUT/blocks.txt"
import os
names = sorted(n for n in os.listdir("target/verify_full")
               if n != "oracle_sql.json")
assert len(names) == 419, f"expected 419 keys, got {len(names)}"
blocks = {}
for n in names:
    blocks.setdefault(n.split("_")[0], []).append(n)
for tok in sorted(blocks):
    print(tok, " ".join(blocks[tok]))
PYEOF
while read -r tok members; do
  bench "sf1_block_$tok" target/sf1 $members
done < "$OUT/blocks.txt"

# ---- same-day isolated re-measures: the r16 outlier set ----------------
for q in dedup_ngram_jaccard text_bigram_surprisal text_tfidf_topk \
         text_repetition_filter dedup_simhash dedup_containment_approx \
         join_interval_overlap; do
  bench "iso_sf1_$q" target/sf1 "$q"
done
echo ALL_DONE
