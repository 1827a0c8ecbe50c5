#!/bin/bash
# r16 round-close sweeps: full sf0.1 then full sf1, min-of-3, fresh JVM
# each. One Spark JVM at a time; never compile while this runs.
set -u
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g -XX:ReservedCodeCacheSize=512m"
CP="target/scala-2.13/classes:/opt/spark/jars/*"

# capture rc from the java run itself — a crashed sweep must not ship
# a truncated artifact under a logged rc=0 (r16 review fix)
env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
  java $AO $JOPTS -cp "$CP" graft.Bench \
  > bench_local_r16_raw.out 2> target/sweep_r16_sf01.err
rc=$?
if [ $rc -eq 0 ]; then tail -1 bench_local_r16_raw.out > bench_local_r16.json; fi
rm -f bench_local_r16_raw.out
echo "done sf0.1 rc=$rc"

env SPARK_GRAFT_SF_DIR=target/sf1 SPARK_GRAFT_BENCH_RUNS=3 \
  java $AO $JOPTS -cp "$CP" graft.Bench \
  > bench_local_r16_sf1_raw.out 2> target/sweep_r16_sf1.err
rc=$?
if [ $rc -eq 0 ]; then tail -1 bench_local_r16_sf1_raw.out > bench_local_r16_sf1_full.json; fi
rm -f bench_local_r16_sf1_raw.out
echo "done sf1 rc=$rc"
echo ALL_SWEEPS_DONE
