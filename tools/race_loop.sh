#!/usr/bin/env bash
# Repeated-run harness for the concurrency race suites (r13 verdict item
# 3: one execution of a racy window is not a proof). Each run already
# loops internally — the two-real-JVM publish race does 20 LOCKSTEP
# rounds per spawn, the in-process publisher race 10 fresh-root
# iterations, the cycle-claim sweep race 20 two-thread iterations — so
# N outer runs exercise N*20 aligned two-JVM windows and N*30 in-process
# ones. Exits non-zero if ANY run fails a test or fails to invoke (the
# r14 grep matched the '*** N TESTS FAILED' line as success — a red race
# run read as green). Usage: tools/race_loop.sh [N]   (default 3)
set -u
N="${1:-3}"
cd "$(dirname "$0")/.."
fails=0
for i in $(seq 1 "$N"); do
  echo "=== RACE LOOP RUN $i/$N ==="
  out="$(sbt -batch "testOnly graft.sources.VersionedStoreSpec graft.IncrementalRepairSpec graft.operators.ArtifactRaceSpec" 2>&1)"
  rc=$?
  echo "$out" | grep -E "Tests: succeeded|\*\*\* [0-9]+ TEST" || true
  if [ "$rc" -ne 0 ]; then
    echo "RUN $i: sbt invocation failed (rc=$rc)"; fails=$((fails+1))
  elif echo "$out" | grep -qE "TESTS FAILED|\[error\]"; then
    echo "RUN $i: TESTS FAILED"; fails=$((fails+1))
  elif ! echo "$out" | grep -q "Tests: succeeded"; then
    echo "RUN $i: no test summary found (treating as failure)"
    fails=$((fails+1))
  fi
done
echo "=== $N runs complete, $fails failed runs ==="
[ "$fails" -eq 0 ]
