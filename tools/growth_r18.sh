#!/bin/bash
# r18 growth runs (VERDICT r17 Next #1 ladder claim + Next #7).
#
# 1. PROBE-QUERY ladder (GrowthProbe family probe_query): per-probe
#    candidate volume for the query-regime quantizers — flat trained
#    IVF (k=128, nprobe=16; candidates ~ nprobe*n/k, LINEAR) vs hier
#    4x2 (key space grows with the corpus, candidates ~bounded) — over
#    500 .. 512k vectors (3 decades past HierSwitchN=4096).
#    -> growth_probe_query_r18.json
# 2. PAIR-regime hier leg, one decade past r17's 256k rung, HIER ONLY
#    (flat measured superlinear at 80k/256k in r16 — not re-paid):
#    sfvl512k (kf=512), sfvl1m (kf=1024, AT the clamp), sfvl2m (kf
#    clamped — first past-ceiling rung). -> growth_vecs_hier_r18.json
#
# Corpora from tools/gen_vec_ladder_r17.py + gen_vec_ladder_r18.py.
# Publish-on-rc=0 guard per artifact. One Spark JVM at a time; never
# compile while this runs.
set -u
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -XX:ReservedCodeCacheSize=512m"
CP="target/scala-2.13/classes:/opt/spark/jars/*"

java $AO $JOPTS -cp "$CP" graft.GrowthProbe probe_query \
  /root/testdata/sf0.01 /root/testdata/sf0.1 target/sfgate5k \
  target/sfvl24k target/sfvl48k target/sfvs target/sfvl512k \
  > target/growth_probe_query_r18.raw 2> target/growth_probe_query_r18.err
rc=$?
echo "probe_query rc=$rc"
[ $rc -eq 0 ] && mv target/growth_probe_query_r18.raw growth_probe_query_r18.json

SPARK_GRAFT_GROWTH_LEGS=hier \
  java $AO $JOPTS -cp "$CP" graft.GrowthProbe vecs_hier \
  target/sfvl512k target/sfvl1m target/sfvl2m \
  > target/growth_vecs_hier_r18.raw 2> target/growth_vecs_hier_r18.err
rc=$?
echo "vecs_hier rc=$rc"
[ $rc -eq 0 ] && mv target/growth_vecs_hier_r18.raw growth_vecs_hier_r18.json
echo GROWTH_DONE
