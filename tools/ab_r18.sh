#!/bin/bash
# r18 optimization-round same-host A/B (guide §1: measure on ONE host
# state, not across rounds): the three committed r18 sf0.1 passes all
# ran on an evening the host delivered ~18% less CPU (sentinel 3.9-4.3
# vs r17's 5.17 with zero other java/spark procs), so r17-artifact vs
# r18-artifact deltas are host-confounded. This script times the
# round-17-close build (compiled from commit 7d90a0c in a detached
# worktree) and HEAD back-to-back on the same box:
#   1. HEAD  sf0.1 full sweep (min-of-3, fresh JVM)  -> ab_head_sf01
#   2. r17   sf0.1 full sweep (same protocol)        -> ab_r17_sf01
#   3. sf1 focused bucket A/B at HEAD: the bucket-count change
#      isolated by env (SPARK_GRAFT_INDEX_BUCKETS=8 replays the old
#      constant; unset = adaptive max(8, defaultParallelism) = 32
#      here) over the index-consuming prefixes.
# One Spark JVM at a time; never compile while this runs.
set -u
cd /root/repo
OUT=target/ab_r18
mkdir -p "$OUT"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -XX:ReservedCodeCacheSize=512m"

bench() { # bench <outfile> <classdir> <sfdir> <extra-env as K=V ...> -- <prefix...>
  local out="$1" cls="$2" dir="$3"; shift 3
  local envs=()
  while [ $# -gt 0 ] && [ "$1" != "--" ]; do envs+=("$1"); shift; done
  [ $# -gt 0 ] && shift
  env SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_RUNS=3 \
    ${envs[@]+"${envs[@]}"} \
    java $AO $JOPTS -cp "$cls:/opt/spark/jars/*" \
    graft.Bench "$@" >"$OUT/$out.raw" 2>"$OUT/$out.err"
  local rc=$?
  if [ $rc -eq 0 ]; then mv "$OUT/$out.raw" "$OUT/$out.json"
  else rm -f "$OUT/$out.raw"; fi
  echo "done $out rc=$rc $(date -u +%H:%M:%S)"
}

HEADCLS=target/scala-2.13/classes
R17CLS=/tmp/r17base/target/scala-2.13/classes
PFX="dedup_ graph_triangles graph_clustering_coeff graph_link_predict basket_ text_token_count text_bpe_tokenize text_bpe_vocab text_tokenizer_fertility"

bench head_sf01 "$HEADCLS" /root/testdata/sf0.1 --
bench r17_sf01  "$R17CLS"  /root/testdata/sf0.1 --
bench sf1_buckets_adaptive "$HEADCLS" target/sf1 -- $PFX
bench sf1_buckets_8        "$HEADCLS" target/sf1 SPARK_GRAFT_INDEX_BUCKETS=8 -- $PFX
echo ALL_DONE
