#!/bin/bash
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
OUT=scripts/bsweep2.out
: > "$OUT"
for b in 4 2 1; do   # REVERSED order to expose drift
  echo "=== $(date -u +%H:%M:%S) eigsh n=1000000 b=$b rep2" >> "$OUT"
  env SPARK_GRAFT_CPUS=32 java $OPENS -Xmx32g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.ScaleProbe eigsh 1000000 $b \
    2>>"$OUT.err" | grep '"probe"' >> "$OUT"
done
for b in 4 1; do
  echo "=== $(date -u +%H:%M:%S) eigsh n=4000000 b=$b rep2" >> "$OUT"
  env SPARK_GRAFT_CPUS=32 java $OPENS -Xmx32g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.ScaleProbe eigsh 4000000 $b \
    2>>"$OUT.err" | grep '"probe"' >> "$OUT"
done
echo "DONE" >> "$OUT"
