#!/bin/bash
# Round-3 hardware measurement queue (run when the TPU tunnel is up).
# Sequential (single host core); each step logs to /tmp/hwq_*.log and
# appends a summary line here-below for docs/ROUND3_NOTES.md.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hwq_summary.txt
: > "$OUT"

run() {
  name=$1; shift
  echo "=== $name: $* ===" | tee -a "$OUT"
  timeout 2400 "$@" > "/tmp/hwq_${name}.log" 2>&1
  rc=$?
  tail -15 "/tmp/hwq_${name}.log" | tee -a "$OUT"
  echo "[$name rc=$rc]" | tee -a "$OUT"
}

run probe   python tools/probe_gather.py
run sparse  python tools/bench_sparse.py
run flags   python tools/bench_r3_flags.py
run bench   python bench.py
run zoo     python tools/bench_zoo.py SECOND SECOND:xwin CenterPoint
run stem    python tools/bench_stem.py
echo "queue done" | tee -a "$OUT"
