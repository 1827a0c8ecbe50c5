#!/bin/bash
# r18 measurement pipeline: verify_full regen (block enumeration needs
# the 422-key name set) -> sweeps (sf0.1 full + sf1 blocks + iso set)
# -> growth ladders. Sequential: one Spark JVM at a time.
set -u
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -XX:ReservedCodeCacheSize=512m"
rm -rf target/verify_full
java $AO $JOPTS -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify /root/testdata/sf0.001 target/verify_full \
  2> target/verify_full.err
echo "verify_full rc=$?"
bash tools/sweeps_r18.sh > target/sweeps_r18.log 2>&1
echo "sweeps rc=$?"
bash tools/growth_r18.sh > target/growth_r18.log 2>&1
echo "growth rc=$?"
echo PIPELINE_DONE
# appended r18: clean sf0.1 re-run after the blocks (the first pass ran
# on a contended host — sentinel ratio 4.19, other_java=1 from the idle
# sbt shell; §6 sentinel rule: re-run, keep the contended artifact as
# evidence)
