#!/usr/bin/env bash
# Round-close gate (VERDICT r11 item 9): the checks a round must pass
# before its end-of-round commit, recorded in one artifact. Runs BOTH
# suites (ScalaTest + PySpark pytest), the sf0.01 correctness gate, and
# the idle bench. Usage: bash scripts/round_close.sh [round_tag]
#
# Protocol reminders (NOTES): never run this while probes/benches/compiles
# are active — the bench leg refuses its archive write if contended.
set -u
cd "$(dirname "$0")/.."
TAG=${1:-r$(date +%s)}
OUT=ROUNDCLOSE_$TAG.md
: > "$OUT"

note() { echo "$*" | tee -a "$OUT"; }

note "# Round-close $TAG — $(date -u +%FT%TZ) @ $(git rev-parse --short HEAD)"

note ""
note "## sbt test"
sbt test > /tmp/roundclose_sbt_test.log 2>&1
SBT_RC=$?
grep -E "Tests: |Suites: " /tmp/roundclose_sbt_test.log | tail -2 | tee -a "$OUT"
note "exit=$SBT_RC"

note ""
note "## pytest python/tests"
python -m pytest python/tests -q > /tmp/roundclose_pytest.log 2>&1
PY_RC=$?
tail -3 /tmp/roundclose_pytest.log | tee -a "$OUT"
note "exit=$PY_RC"

note ""
note "## correctness gate (sf0.01)"
python scripts/check.py /root/testdata/sf0.01 /tmp/graft_roundclose > /tmp/roundclose_check.log 2>&1
CHECK_RC=$?
tail -2 /tmp/roundclose_check.log | tee -a "$OUT"
note "exit=$CHECK_RC"

note ""
note "## bench (sf0.1, 3-rep medians; archive refused if contended)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Bench" > /tmp/roundclose_bench.log 2>&1
BENCH_RC=$?
grep '"metric"' /tmp/roundclose_bench.log | tail -1 | tee -a "$OUT"
grep "CONTENDED" /tmp/roundclose_bench.log | tee -a "$OUT" || true
note "exit=$BENCH_RC"

note ""
if [ $SBT_RC -eq 0 ] && [ $PY_RC -eq 0 ] && [ $CHECK_RC -eq 0 ] && [ $BENCH_RC -eq 0 ]; then
  note "RESULT: ALL GREEN"
  exit 0
else
  note "RESULT: FAILURES (sbt=$SBT_RC pytest=$PY_RC check=$CHECK_RC bench=$BENCH_RC)"
  exit 1
fi
