#!/usr/bin/env bash
# Subset bench runner for the optimization loop: runs graft.Bench directly
# from compiled classes (no sbt startup), restricted to a comma-separated
# query list, writing the full-map JSON where told. All SPARK_GRAFT_*
# env overrides pass through (floor A/Bs set SPARK_GRAFT_MIN_PARTITION_SIZE).
#
# Usage: tools/bench_subset.sh <queries-or-"all"> <out.json> [sf_dir]
set -euo pipefail
cd "$(dirname "$0")/.."

ONLY="${1:?comma-separated query names, or 'all'}"
OUT="${2:?output json path}"
SF="${3:-/root/testdata/sf0.1}"

CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent \
  java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action \
  sun.util.calendar; do
  echo --add-opens java.base/$p=ALL-UNNAMED; done)

export SPARK_GRAFT_SF_DIR="$SF"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
export SPARK_GRAFT_BENCH_OUT="$OUT"
if [ "$ONLY" != "all" ]; then export SPARK_GRAFT_ONLY="$ONLY"; fi

# JAVA_EXTRA: extra JVM flags for A/B experiments (e.g. code-cache sizing)
java $OPENS -Xmx48g ${JAVA_EXTRA:-} -cp "$CP" graft.Bench
