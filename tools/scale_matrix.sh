#!/usr/bin/env bash
# Reproduce the BENCH_SCALING.md round-3 evidence matrix.
#
# Usage:  tools/scale_matrix.sh [sizes...]     (default: 8000000 16000000 32000000)
#
# Emits one JSON line per leg. Notes that keep the numbers honest:
# - fixtures are generated at full cores on first use (ScaleBench does this
#   itself when the run is NOT tasksetted; under taskset generation is slow,
#   so we pre-touch each fixture with an untasksetted 32-core run first)
# - each leg is min-of-2 reps inside one JVM (ambient noise is +-20%, with
#   occasional degraded windows — compare legs measured close together)
# - spread placement (one core per complex-slot) models independent
#   executors; contiguous models N cores crammed into one memory domain
# - never run any other sbt/java process concurrently
set -euo pipefail
cd "$(dirname "$0")/.."

if [ $# -gt 0 ]; then SIZES=("$@"); else SIZES=(8000000 16000000 32000000); fi

leg() { # leg <rows> <taskset-spec> <cores> [env...]
  local rows=$1 cpus=$2 cores=$3; shift 3
  env SPARK_GRAFT_SCALE_ROWS="$rows" "$@" taskset -c "$cpus" \
    sbt -batch "runMain graft.ScaleBench $cores 2" 2>/dev/null | grep '"metric"'
}

for R in "${SIZES[@]}"; do
  echo "# rows=$R — generate fixture at full cores (discard measurement)"
  SPARK_GRAFT_SCALE_ROWS="$R" sbt -batch "runMain graft.ScaleBench 32 1" \
    2>/dev/null | grep '"metric"'

  echo "# rows=$R — contiguous placement"
  leg "$R" 0-1 2
  leg "$R" 0-7 8

  echo "# rows=$R — spread placement"
  leg "$R" 0,16 2
  leg "$R" 0,4,8,12,16,20,24,28 8

  echo "# rows=$R — perfectly-parallel scan control (contiguous)"
  leg "$R" 0-1 2 SPARK_GRAFT_SCALE_MODE=scan
  leg "$R" 0-7 8 SPARK_GRAFT_SCALE_MODE=scan
done

echo "# dedup pipeline (8M-doc realistic-vocabulary corpus), spread placement"
env SPARK_GRAFT_SCALE_MODE=dedup taskset -c 0,16 \
  sbt -batch "runMain graft.ScaleBench 2 2" 2>/dev/null | grep '"metric"'
env SPARK_GRAFT_SCALE_MODE=dedup taskset -c 0,4,8,12,16,20,24,28 \
  sbt -batch "runMain graft.ScaleBench 8 2" 2>/dev/null | grep '"metric"'
