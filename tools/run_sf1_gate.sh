#!/usr/bin/env bash
# sf1 (10x) full-suite correctness gate: run every registered query on the
# scaled store and compare against the DuckDB oracle with a 300 s per-query
# DNF timeout (oracle queries that exceed it are engine-only rows, not
# failures — at sf1 DuckDB cannot finish the pair-generating family).
#
# Prereqs: target/sf1 built by tools/make_scaled.py from /root/testdata/sf0.1;
# classes compiled (sbt compile). Renders BASELINE.md rows with
# tools/render_sf1_table.py from the check log.
#
# Usage: tools/run_sf1_gate.sh [sf_dir] [out_dir] [timeout_sec]
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-target/sf1}"
OUT_DIR="${2:-target/bg-jobs/verify_sf1}"
TIMEOUT="${3:-300}"

CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent \
  java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action \
  sun.util.calendar; do
  echo --add-opens java.base/$p=ALL-UNNAMED; done)

SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  java $OPENS -Xmx48g -cp "$CP" graft.Verify "$SF_DIR" "$OUT_DIR" \
  2>"$OUT_DIR.stderr.log"
python3 tools/check_oracle.py "$SF_DIR" "$OUT_DIR" "$TIMEOUT"
