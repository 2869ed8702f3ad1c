#!/bin/bash
# Round-10 order-of-magnitude scale sweep (VERDICT r9 item 5): runs the
# heavy-family ScaleProbe modes at ~10x their recorded sizes, appending
# one JSON line per probe to scripts/probe_sweep.out. Uses plain `java`
# on the compiled classes so a concurrently-running sbt keeps working.
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
OUT=scripts/probe_sweep.out
run() {
  local mem=$1; shift
  local env_extra=$1; shift
  echo "=== $(date -u +%H:%M:%S) START $* (mem=$mem $env_extra)" >> "$OUT"
  env $env_extra java $OPENS -Xmx$mem -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.ScaleProbe "$@" \
    2>>"$OUT.err" | grep '"probe"' >> "$OUT"
  echo "=== $(date -u +%H:%M:%S) DONE $*" >> "$OUT"
}
: > "$OUT"; : > "$OUT.err"
run 24g SPARK_GRAFT_CPUS=32 zorder 100000000
run 24g SPARK_GRAFT_CPUS=32 lshdedup 1000000
run 24g SPARK_GRAFT_CPUS=32 lpa 2000000
run 24g SPARK_GRAFT_CPUS=32 stream 20000000
run 24g SPARK_GRAFT_STATESTORE=rocksdb stream 10000000
run 48g SPARK_GRAFT_CPUS=32 eigsh 10000000 2
run 48g SPARK_GRAFT_CPUS=32 allpairszipf 200000
run 48g SPARK_GRAFT_CPUS=32 trust 100000
run 24g SPARK_GRAFT_CPUS=32 lapkeyed 20000
run 48g SPARK_GRAFT_CPUS=32 graphopt 200000
run 64g SPARK_GRAFT_CPUS=32 ballcover 300000
run 24g SPARK_GRAFT_CPUS=32 lapkeyed 50000
echo "=== SWEEP COMPLETE $(date -u)" >> "$OUT"
