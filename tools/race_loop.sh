#!/usr/bin/env bash
# Repeated-run harness for the concurrency race suites (r13 verdict item
# 3: one execution of a racy window is not a proof). Each run already
# loops internally — the two-real-JVM publish race does 20 LOCKSTEP
# rounds per spawn, the in-process publisher race 10 fresh-root
# iterations, the cycle-claim sweep race 20 two-thread iterations — so
# N outer runs exercise N*20 aligned two-JVM windows and N*30 in-process
# ones. Usage: tools/race_loop.sh [N]   (default 3)
set -u
N="${1:-3}"
cd "$(dirname "$0")/.."
fails=0
for i in $(seq 1 "$N"); do
  echo "=== RACE LOOP RUN $i/$N ==="
  if ! sbt -batch "testOnly graft.sources.VersionedStoreSpec graft.IncrementalRepairSpec graft.operators.ArtifactRaceSpec" 2>&1 \
    | grep -E "Tests: succeeded|\*\*\* [0-9]+ TEST"; then
    echo "RUN $i: sbt invocation failed"; fails=$((fails+1)); continue
  fi
done
echo "=== $N runs complete, $fails invocation failures (see per-run Tests: lines above) ==="
