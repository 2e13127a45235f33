#!/usr/bin/env bash
# spark-submit launcher for the benchmark (north rule: "launched via
# spark-submit ... at N and 4N executors"). Two sandbox forms:
#
#   tools/run_bench.sh 2            # N cores   (--master local[2])
#   tools/run_bench.sh 8            # 4N cores  (--master local[8])
#   tools/run_bench.sh -e 1         # N executors  (local-cluster[1,2,8192])
#   tools/run_bench.sh -e 4         # 4N executors (local-cluster[4,2,8192])
#
# -e runs real multi-JVM executors (separate executor processes, task
# dispatch over RPC) — the literal executor-count axis of the rule; the
# plain form scales cores inside one JVM. On a real cluster swap the
# master URL for yarn/k8s and use --num-executors.
set -euo pipefail
MODE=cores
if [[ "${1:-}" == "-e" ]]; then MODE=executors; shift; fi
N="${1:-8}"
cd "$(dirname "$0")/.."
sbt -batch package >&2
JAR=$(ls target/scala-2.13/raptorspark_*.jar | grep -v -- '-tests' | head -1)
if [[ "$MODE" == executors ]]; then
  MASTER="local-cluster[$N,2,8192]"
  CPUS=$((N * 2))
  # Executor JVMs need the app classes on their own classpath; Bench.scala
  # sets spark.executor.extraClassPath itself for local-cluster masters
  # (session-builder confs override --conf, so setting it here too would
  # just be dead code) — the script only sizes executor memory. Bench's
  # path is cwd-relative; this script cd's to the repo root above.
  EXTRA=(--conf "spark.executor.memory=8g")
  export SPARK_SCALA_VERSION=2.13
else
  MASTER="local[$N]"
  CPUS="$N"
  EXTRA=()
fi
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="$CPUS" \
SPARK_GRAFT_MASTER="$MASTER" \
SPARK_GRAFT_REPLICATE="${SPARK_GRAFT_REPLICATE:-400}" \
SPARK_GRAFT_HEADLINE_ONLY="${SPARK_GRAFT_HEADLINE_ONLY:-1}" \
/opt/spark/bin/spark-submit \
  --master "$MASTER" \
  --driver-memory "${SPARK_DRIVER_MEM:-48g}" \
  "${EXTRA[@]}" \
  --class graft.Bench \
  "$JAR" 2>/dev/null
