#!/bin/bash
# Round-11 multi-JVM evidence (VERDICT r10 item 5): same probes, same total
# cores (32), local[32] single-JVM vs local-cluster[2,16,4096] (2 real
# executor JVMs + Netty shuffle).
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
OUT=scripts/lcsweep.out
: > "$OUT"
run() {
  local tag=$1; shift
  local master_env=$1; shift
  echo "=== $(date -u +%H:%M:%S) $tag $*" >> "$OUT"
  env SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 SPARK_GRAFT_CPUS=32 $master_env \
    java $OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.ScaleProbe "$@" 2>>"$OUT.err" | grep '"probe"' | sed "s/^/$tag /" >> "$OUT"
}
run LOCAL    "SPARK_GRAFT_DUMMY=1"                              lapkeyed 10000
run CLUSTER  "SPARK_GRAFT_MASTER=local-cluster[2,16,4096]"      lapkeyed 10000
run LOCAL    "SPARK_GRAFT_DUMMY=1"                              eigsh 1000000 2
run CLUSTER  "SPARK_GRAFT_MASTER=local-cluster[2,16,4096]"      eigsh 1000000 2
echo DONE >> "$OUT"
