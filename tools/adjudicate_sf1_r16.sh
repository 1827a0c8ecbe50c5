#!/bin/bash
# r16 adjudication of the r15 sf1 dedup-block regressions (VERDICT #1).
#
# For each regressed query (bench_local_r15_sf1_full.json vs r14):
#   dedup_winnowing_pairs 4.01→8.45, dedup_ngram_jaccard 11.46→15.36,
#   dedup_cluster_stats 6.24→8.28, dedup_cluster_survivors 6.91→8.25,
#   etl_bloom_manifest 1.97→3.82, agg_exact_median_2pass 0.91→1.95
# run:
#  (a) ISOLATED fresh-JVM min-of-3 at sf1 (the bench-methodology
#      headline protocol);
#  (b) PRE-WARMED variants: the query together with the
#      alphabetically-earlier member of its shared-machinery family
#      (minhash→ngram, substring→winnowing, components→stats/survivors)
#      in one JVM, so shared-index/JIT warmth attribution is visible;
#  (c) the WHOLE dedup block in sweep-local alphabetical order — the
#      exact neighborhood the full-sweep numbers came from.
# One Spark JVM at a time; never compile while this runs.
set -u
cd /root/repo
OUT=target/adjudicate_r16
mkdir -p "$OUT"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -XX:ReservedCodeCacheSize=512m"

bench() { # bench <outfile> <prefix...>
  # truncated-artifact guard (r17, mirrors sweeps_r16.sh): write to a
  # .raw file and publish the final .json only on rc=0, so a crashed
  # run can never be ingested downstream as a complete measurement
  local out="$1"; shift
  SPARK_GRAFT_SF_DIR=target/sf1 SPARK_GRAFT_BENCH_RUNS=3 \
    java $AO $JOPTS -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench "$@" >"$OUT/$out.raw" 2>"$OUT/$out.err"
  local rc=$?
  if [ $rc -eq 0 ]; then mv "$OUT/$out.raw" "$OUT/$out.json"
  else rm -f "$OUT/$out.raw"; fi
  echo "done $out rc=$rc"
}

for q in dedup_winnowing_pairs dedup_ngram_jaccard dedup_cluster_stats \
         dedup_cluster_survivors etl_bloom_manifest agg_exact_median_2pass; do
  bench "iso_$q" "$q"
done

bench warm_ngram dedup_minhash_lsh dedup_ngram_jaccard
bench warm_winnowing dedup_substring dedup_winnowing_pairs
bench warm_cluster dedup_cluster_components dedup_cluster_stats dedup_cluster_survivors

bench block_dedup dedup_
echo ALL_DONE
