#!/bin/bash
# probe_query ladder re-run (first attempt failed: missing qv quantize
# column in the probe's flat leg — fixed in GrowthProbe).
set -u
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -XX:ReservedCodeCacheSize=512m"
java $AO $JOPTS -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.GrowthProbe probe_query \
  /root/testdata/sf0.01 /root/testdata/sf0.1 target/sfgate5k \
  target/sfvl24k target/sfvl48k target/sfvs target/sfvl512k \
  > target/growth_probe_query_r18.raw 2> target/growth_probe_query_r18.err
rc=$?
echo "probe_query rc=$rc"
[ $rc -eq 0 ] && mv target/growth_probe_query_r18.raw growth_probe_query_r18.json
