#!/bin/bash
# Redo leg of the round-10 sweep: waits for probe_sweep.sh to finish, then
# runs the two probes whose big-n oracle tiers were patched mid-sweep
# (trust: lossless-embedding == exactly 1.0; allpairszipf: prefix-only with
# planted-copy completeness).
set -u
cd /root/repo
while pgrep -f probe_sweep.sh > /dev/null || pgrep -f "graft.ScaleProbe" > /dev/null; do sleep 30; done
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
OUT=scripts/probe_sweep2.out
run() {
  local mem=$1; shift
  echo "=== $(date -u +%H:%M:%S) START $* (mem=$mem)" >> "$OUT"
  env SPARK_GRAFT_CPUS=32 java $OPENS -Xmx$mem -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.ScaleProbe "$@" \
    2>>"$OUT.err" | grep '"probe"' >> "$OUT"
  echo "=== $(date -u +%H:%M:%S) DONE $*" >> "$OUT"
}
: > "$OUT"; : > "$OUT.err"
run 48g trust 100000
run 48g allpairszipf 200000
echo "=== SWEEP2 COMPLETE $(date -u)" >> "$OUT"
