#!/bin/bash
# r17 consumer-level quantizer ladder (VERDICT r16 Next #1 done
# criterion: "a ladder artifact showing CONSUMER-level, not just
# assignment-level, linear growth").
#
# For each corpus on the ladder (8k gate sf1 -> 24k -> 48k -> 80k ->
# 256k), time the two heaviest adaptive consumers (vec_knn_graph,
# dedup_embedding) with the quantizer FORCED to each side
# (SPARK_GRAFT_VEC_QUANTIZER=flat|hier) in separate fresh JVMs. The
# adaptive decision should pick the measured winner on BOTH sides of
# the switch. (Historical note: this script was built to test the
# PRE-measurement placement HierSwitchN = 32768; the ladder it ran
# put the crossover between 2k and 8k, and the SHIPPED constant is
# Ivf.HierSwitchN = 4096 — see Ivf.scala. Measurements are
# unaffected: both legs are env-forced, never adaptive.)
#
# Also times the r16 verdict-#3 item: ann_ivf_hierarchical guarded
# (SPARK_GRAFT_VEC_DUP_COLLAPSE=always) vs adaptive-skip (default) at
# sf0.1/sf1 — done = skip <= 1.2x ... >= guarded recovers the ~2x.
#
# One Spark JVM at a time; never compile while this runs.
set -u
cd /root/repo
OUT=target/growth_consumer_r17
mkdir -p "$OUT"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -XX:ReservedCodeCacheSize=512m"

bench() { # bench <outfile> <sfdir> <runs> <env...> -- <prefix...>
  # truncated-artifact guard: publish .json only on rc=0
  local out="$1" dir="$2" runs="$3"; shift 3
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  env SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_RUNS="$runs" "${envs[@]}" \
    java $AO $JOPTS -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench "$@" >"$OUT/$out.raw" 2>"$OUT/$out.err"
  local rc=$?
  if [ $rc -eq 0 ]; then mv "$OUT/$out.raw" "$OUT/$out.json"
  else rm -f "$OUT/$out.raw"; fi
  echo "done $out rc=$rc"
}

# quantizer A/B per ladder corpus; runs=2 (min-of-2), except the 256k
# flat leg (runs=1 — the regime split is 10x+, a single run suffices
# and the leg alone costs ~10 min)
for spec in "sf1 target/sf1 2" "vl24k target/sfvl24k 2" \
            "vl48k target/sfvl48k 2" "dx10 target/sfdx10 2"; do
  set -- $spec
  tag=$1; dir=$2; runs=$3
  bench "flat_$tag" "$dir" "$runs" SPARK_GRAFT_VEC_QUANTIZER=flat -- vec_knn_graph dedup_embedding
  bench "hier_$tag" "$dir" "$runs" SPARK_GRAFT_VEC_QUANTIZER=hier -- vec_knn_graph dedup_embedding
done
bench flat_vs256k target/sfvs 1 SPARK_GRAFT_VEC_QUANTIZER=flat -- vec_knn_graph dedup_embedding
bench hier_vs256k target/sfvs 2 SPARK_GRAFT_VEC_QUANTIZER=hier -- vec_knn_graph dedup_embedding

# duplicate-collapse guarded-vs-skip at sf0.1 and sf1 (both dup-free,
# so the adaptive probe picks skip; "always" re-arms the r16 guard)
for spec in "sf01 /root/testdata/sf0.1" "sf1 target/sf1"; do
  set -- $spec
  tag=$1; dir=$2
  bench "collapse_always_$tag" "$dir" 3 SPARK_GRAFT_VEC_DUP_COLLAPSE=always -- ann_ivf_hierarchical
  bench "collapse_skip_$tag" "$dir" 3 -- ann_ivf_hierarchical
done
echo ALL_DONE
