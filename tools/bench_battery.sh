#!/usr/bin/env bash
# Round-end measurement battery: min-of-5 headline runs per config in ONE
# window (cores 2 / 8 / 32, executor JVMs 1 / 4), configs interleaved per
# repetition. Emits a JSON line per run to the file given as $1. (The
# full-suite local[32] run is separate: `SPARK_GRAFT_SF_DIR=... sbt
# "runMain graft.Bench"` without SPARK_GRAFT_HEADLINE_ONLY.)
set -euo pipefail
OUT="${1:-/tmp/bench_battery.jsonl}"
: > "$OUT"
cd "$(dirname "$0")/.."
echo "window_start $(date -u +%FT%TZ) loadavg $(cut -d' ' -f1-3 /proc/loadavg)" >&2
for rep in 1 2 3 4 5; do
  for cfg in "c 2" "c 8" "c 32" "e 1" "e 4"; do
    set -- $cfg
    if [[ "$1" == c ]]; then ARGS=("$2"); else ARGS=(-e "$2"); fi
    LINE=$(tools/run_bench.sh "${ARGS[@]}" | tail -1)
    echo "{\"cfg\":\"$1$2\",\"rep\":$rep,\"r\":$LINE}" >> "$OUT"
    echo "done cfg=$1$2 rep=$rep" >&2
  done
done
echo "window_end $(date -u +%FT%TZ) loadavg $(cut -d' ' -f1-3 /proc/loadavg)" >&2
