#!/usr/bin/env bash
# The standing sf1 gate (VERDICT r13 #6): synthesize the 10x-sf0.1
# dataset if absent, run the full-surface bench on it, archive the
# per-query map, and compare against the previous round's sf1 archive
# with the spread-aware median-of-ratios tool.
#
# Protocol notes (SCALE.md round-13/14):
#  - QUIET MACHINE: nothing else running — the r13 storm run produced
#    3 false failures; re-times on a quiet host collapsed them.
#  - local[8] / 24g driver: the archived protocol since r13; keep it
#    so cross-round ratios compare like with like.
#
# Usage: dev/sf1_gate.sh <round>        e.g. dev/sf1_gate.sh 15
#   writes BENCH_LOCAL_sf1_r<round>.json and prints the A/B vs the
#   newest previous BENCH_LOCAL_sf1*.json archive.
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: dev/sf1_gate.sh <round>}"
SF1="${SF1_DIR:-/tmp/graft_sf1}"

if [ ! -f "$SF1/_GRAFT_SF_COMPLETE" ]; then
  echo "== building sf1 dataset at $SF1 =="
  SPARK_GRAFT_CPUS=16 SPARK_DRIVER_MEM=24g \
    dev/run.sh graft.tools.SfScale /root/testdata/sf0.1 "$SF1" 10 2>/dev/null
fi

echo "== sf1 bench (local[8], 24g — the archived protocol) =="
SPARK_GRAFT_CPUS=8 SPARK_DRIVER_MEM=24g SPARK_GRAFT_SF_DIR="$SF1" \
  dev/run.sh graft.Bench 2>/dev/null | tail -1
cp BENCH_LOCAL.json "BENCH_LOCAL_sf1_r${ROUND}.json"
echo "archived BENCH_LOCAL_sf1_r${ROUND}.json"

PREV=$(ls -1 BENCH_LOCAL_sf1*.json | grep -v "_r${ROUND}\.json$" | sort | tail -1 || true)
if [ -n "$PREV" ]; then
  echo "== A/B vs $PREV (median-of-ratios, spread-aware) =="
  python3 dev/bench_ratio.py "$PREV" "BENCH_LOCAL_sf1_r${ROUND}.json" || true
fi
