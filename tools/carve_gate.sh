#!/bin/bash
# FULL-CATALOG scale gate (round-12 extension of validate_carve.sh):
# build the dims-fixed perturbing ×K carve, run ALL of SparkEntry's
# queries against it, and compare every one with the DuckDB oracle —
# the end-to-end proof that the whole library, not just a swept
# subset, stays hash-exact at a scale the driver never ships. This is
# what caught q335's ANSI overflow, q219's driver-ceiling pull, q119's
# recursion cap, q18's round()-tie divergence, and the q340-class
# oracle CTE blowups in round 12.
#
#   tools/carve_gate.sh                       # sf0.1 ×10 -> /tmp/graft_x10
#   tools/carve_gate.sh sf0.1 10 /tmp/c 8     # custom src/scale/dir/shards
#
# The compare runs as N parallel tools/check.py shards (one slow oracle
# otherwise serializes the catalog; q155's naive spatial oracle alone
# is ~10 min at ×10). Expect ~30-60 min engine + ~1-2 h compare on a
# 32-core host. Requires /tmp/cp.txt (see tools/run.sh header).
set -e
cd "$(dirname "$0")/.."

SRC=${1:-sf0.1}
K=${2:-10}
OUT=${3:-/tmp/graft_x10}
SHARDS=${4:-6}
VDIR=/tmp/graft_carve_full

rm -rf "$OUT" "$VDIR"
python3 tools/make_carve.py "/root/testdata/$SRC" "$K" "$OUT" --full
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-24g} tools/run.sh graft.Verify "$OUT" "$VDIR"

if [ -s "$VDIR/VERIFY_ERRORS.json" ] && [ "$(cat "$VDIR/VERIFY_ERRORS.json")" != "{}" ]; then
  echo "ENGINE-SIDE FAILURES at the carve:"
  cat "$VDIR/VERIFY_ERRORS.json"
fi

# Clear shard logs from any previous run: an earlier invocation with
# MORE shards leaves orphan logs whose stale FAIL/OK lines the summary
# below would re-print and re-count even on a green gate.
rm -f /tmp/carve_gate_shard*.log
PIDS=()
for i in $(seq 0 $((SHARDS - 1))); do
  python3 tools/check.py "$OUT" "$VDIR" "$i/$SHARDS" \
    > "/tmp/carve_gate_shard$i.log" 2>&1 &
  PIDS+=($!)
done
FAILED=0
for p in "${PIDS[@]}"; do wait "$p" || FAILED=1; done
cat /tmp/carve_gate_shard*.log | grep -c '^OK' | xargs -I{} echo "{} OK"
grep -h '^FAIL' /tmp/carve_gate_shard*.log || true
if [ "$FAILED" = 0 ]; then echo "CARVE GATE: ALL GREEN"; else
  echo "CARVE GATE: FAILURES (see /tmp/carve_gate_shard*.log)"; exit 1; fi
