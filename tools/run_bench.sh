#!/usr/bin/env bash
# spark-submit launcher for the benchmark (north rule: "launched via
# spark-submit ... at N and 4N executors"). Local sandbox form: two
# parallelism levels via --master local[N]; on a real cluster swap the
# master URL and --num-executors.
#
#   tools/run_bench.sh 2    # N
#   tools/run_bench.sh 8    # 4N
set -euo pipefail
CORES="${1:-8}"
cd "$(dirname "$0")/.."
sbt -batch package >&2
JAR=$(ls target/scala-2.13/raptorspark_*.jar | head -1)
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="$CORES" \
SPARK_GRAFT_REPLICATE="${SPARK_GRAFT_REPLICATE:-400}" \
SPARK_GRAFT_HEADLINE_ONLY="${SPARK_GRAFT_HEADLINE_ONLY:-1}" \
/opt/spark/bin/spark-submit \
  --master "local[$CORES]" \
  --driver-memory "${SPARK_DRIVER_MEM:-48g}" \
  --class graft.Bench \
  "$JAR" 2>/dev/null
