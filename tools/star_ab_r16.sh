#!/bin/bash
# r16: (a) star-vs-pair edge A/B for the component-consuming dedup
# queries (VERDICT r15 #5 — the probe counted edges, not seconds; the
# sf1 sweep went the wrong way), fresh JVM min-of-3 per (corpus, mode);
# (b) flat-vs-hierarchical IVF growth probe at the decade corpus and
# the new flat-ceiling-saturating corpus (VERDICT r15 #2).
# One Spark JVM at a time; never compile while this runs.
set -u
cd /root/repo
OUT=target/adjudicate_r16
mkdir -p "$OUT"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -XX:ReservedCodeCacheSize=512m"
CP="target/scala-2.13/classes:/opt/spark/jars/*"

python3 tools/gen_vec_saturate.py >"$OUT/gen_sfvs.log" 2>&1
echo "gen done rc=$?"

# force each shape explicitly (the adaptive default would pick its own)
for corpus in sf1 sfdx10 sfov10; do
  for mode in star pairs; do
    env SPARK_GRAFT_SF_DIR=target/$corpus SPARK_GRAFT_BENCH_RUNS=3 \
      SPARK_GRAFT_COMPONENT_EDGES=$mode \
      java $AO $JOPTS -cp "$CP" graft.Bench dedup_cluster \
      >"$OUT/starab_${corpus}_${mode}.json" 2>"$OUT/starab_${corpus}_${mode}.err"
    echo "done starab_${corpus}_${mode} rc=$?"
  done
done

java $AO $JOPTS -cp "$CP" graft.GrowthProbe vecs_hier target/sfdx10 target/sfvs \
  >"$OUT/growth_vecs_hier.json" 2>"$OUT/growth_vecs_hier.err"
echo "done growth_vecs_hier rc=$?"
echo ALL_DONE_AB
