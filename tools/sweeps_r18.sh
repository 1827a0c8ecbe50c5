#!/bin/bash
# r18 sweeps (VERDICT r17 Next #2/#3).
#
# Same protocol as r17 (sf0.1 classic single-JVM full sweep; sf1 block
# mode — fresh JVM per first-token block, merged by
# merge_blocks_r18.py) with ONE change: every block JVM now runs a
# fixed three-query warmup (SPARK_GRAFT_BENCH_WARMUP, untimed, on the
# block's own sfdir) before its timed min-of-3 — r17's block protocol
# charged ~3% of sf1 wall to cold-JIT on the first-timed queries of
# each block (VERDICT r17 What's-wrong #2), so the warmup recovers the
# JIT warmth without giving up per-number provenance. The trio spans
# the hot Spark paths: Tungsten agg (q1_agg), window exec
# (window_running_sum), banded shuffle join (dedup_minhash_lsh).
#
# Also: same-day isolated fresh-JVM min-of-3 for the r17 UNADJUDICATED
# in-sweep regression set (VERDICT r17 Next #2) -> bench_iso_r18/.
#
# All registered queries are covered (422 after the r18 probe-side
# additions). Publish-on-rc=0 guard on every artifact. One Spark JVM
# at a time; never compile while this runs.
set -u
cd /root/repo
OUT=target/sweeps_r18
mkdir -p "$OUT"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -XX:ReservedCodeCacheSize=512m"
WARMUP="q1_agg,window_running_sum,dedup_minhash_lsh"

bench() { # bench <outfile> <sfdir> <warmup 0|1> <prefix...>
  local out="$1" dir="$2" warm="$3"; shift 3
  local wenv=""
  if [ "$warm" = "1" ]; then wenv="$WARMUP"; fi
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_RUNS=3 \
    SPARK_GRAFT_BENCH_WARMUP="$wenv" \
    java $AO $JOPTS -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench "$@" >"$OUT/$out.raw" 2>"$OUT/$out.err"
  local rc=$?
  if [ $rc -eq 0 ]; then mv "$OUT/$out.raw" "$OUT/$out.json"
  else rm -f "$OUT/$out.raw"; fi
  echo "done $out rc=$rc"
}

# ---- sf0.1 classic full sweep (r17-comparable; no warmup — the full
# sweep self-warms, and changing its policy would break comparability)
bench sf01_full /root/testdata/sf0.1 0

# ---- sf1 block sweep: fresh JVM per first-token block, warmed --------
python3 - <<'PYEOF' > "$OUT/blocks.txt"
import os
names = sorted(n for n in os.listdir("target/verify_full")
               if n != "oracle_sql.json")
assert len(names) == 422, f"expected 422 keys, got {len(names)}"
blocks = {}
for n in names:
    blocks.setdefault(n.split("_")[0], []).append(n)
for tok in sorted(blocks):
    print(tok, " ".join(blocks[tok]))
PYEOF
while read -r tok members; do
  bench "sf1_block_$tok" target/sf1 1 $members
done < "$OUT/blocks.txt"

# ---- same-day isolated re-measures: the r17 unadjudicated set --------
mkdir -p bench_iso_r18
for q in dedup_paragraphs basket_rules dedup_band_calibration \
         graph_hits pipeline_dedup_impact stream_attribution_mb; do
  bench "iso_sf1_$q" target/sf1 0 "$q"
  [ -f "$OUT/iso_sf1_$q.json" ] && cp "$OUT/iso_sf1_$q.json" "bench_iso_r18/iso_sf1_$q.json"
done
echo ALL_DONE
