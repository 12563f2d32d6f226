#!/usr/bin/env bash
# Reproducible FULL-BOARD sf1 oracle gate: runs the engine (graft.Verify)
# over every SparkEntry query and the DuckDB oracle (tools/compare.py) at
# sf1, and writes CORRECTNESS_sf1.json (driver-format per-query entries)
# in the repo root. q225 is included — its oracle CC is the unrolled
# hook+compress fold; the old recursive reach was quadratic and timed out
# at this scale.
#
# Usage: tools/sf1_gate.sh [sf1_dir] [out_dir] [query ...]
# sf1_dir defaults to data/sf1 (generate with tools/gen_sf1.py); passing
# query names restricts the run (no JSON artifact is written then — the
# committed artifact must always be the full board).
set -euo pipefail
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
cd "$(dirname "$0")/.."
SF1=${1:-data/sf1}
OUT=${2:-/tmp/vout_sf1}
shift $(( $# > 2 ? 2 : $# ))
[ -d "$SF1" ] || { echo "no sf1 dir at $SF1 — run: python3 tools/gen_sf1.py $SF1 10"; exit 1; }

rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF1 $OUT $*" 2>&1 | tail -2
if [ $# -eq 0 ]; then
  python3 tools/compare.py "$OUT" "$SF1" --json CORRECTNESS_sf1.json
else
  python3 tools/compare.py "$OUT" "$SF1"
fi
