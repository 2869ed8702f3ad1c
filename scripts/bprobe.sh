#!/bin/bash
# r15 probe helper: run graft.Bench on the compiled classes (no sbt lock)
# with the module opens Spark needs. Usage:
#   SPARK_GRAFT_ONLY=q1,q2 SPARK_GRAFT_REPS=3 scripts/bprobe.sh [outfile]
set -u
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
OUT=${1:-/tmp/bprobe.out}
java $OPENS -Xmx8g -cp "$CP" graft.Bench > "$OUT" 2> "$OUT.err"
tail -1 "$OUT"
