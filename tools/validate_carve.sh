#!/bin/bash
# Watermark-calibration scale validation (VERDICT r8 item 7, made
# repeatable): build a k× events carve the driver never ships, run the
# eight watermark-calibrated streaming queries against it, and compare
# bit-exactly with the DuckDB oracle. Any change to the calibration
# constants (two-batch commit lag, outer-join flush gates, restart
# restore, chained-agg propagation) must re-run this BEFORE shipping:
#
#   tools/validate_carve.sh                 # defaults: sf0.1 x3 -> /tmp/graft_sf03
#   tools/validate_carve.sh sf0.01 5 /tmp/c # custom source/scale/dir
#
# Record the green run in PLANS.md per round workflow. Requires
# /tmp/cp.txt (see tools/run.sh header).
set -e
cd "$(dirname "$0")/.."

SRC=${1:-sf0.1}
K=${2:-3}
OUT=${3:-/tmp/graft_sf03}
QUERIES="q107_append_window,q174_watermark_replay,q194_stream_join_disorder,q195_stream_outer_disorder,q199_stream_full_outer_disorder,q205_restart_replay,q206_join_then_window,q225_window_rollup"

rm -rf "$OUT" /tmp/graft_carve_verify
python3 tools/make_carve.py "/root/testdata/$SRC" "$K" "$OUT"
tools/run.sh graft.Verify "$OUT" /tmp/graft_carve_verify "$QUERIES"
python3 tools/check.py "$OUT" /tmp/graft_carve_verify
