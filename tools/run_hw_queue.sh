#!/bin/bash
# Round-5 hardware measurement queue (run when the TPU tunnel is up).
# Sequential (single host core); each step logs to /tmp/hwq_*.log and
# appends a summary line here-below for docs/ROUND5_NOTES.md.
#
# Session arms (post-unroll): the I3D batch-unroll A/B is the round-5
# batch-scaling fix candidate; sparse/lidar re-measure covers the gather
# unroll that landed mid-queue last time; the b1 component pass feeds
# tools/roofline.py (VERDICT r4 items 2/8).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/hwq_summary.txt
MS=/tmp/batch_scaling_r5.jsonl
: > "$OUT"
: > "$MS"

run() {
  name=$1; shift
  echo "=== $name: $* ===" | tee -a "$OUT"
  timeout 2400 "$@" > "/tmp/hwq_${name}.log" 2>&1
  rc=$?
  grep '^{' "/tmp/hwq_${name}.log" >> "$MS"
  tail -15 "/tmp/hwq_${name}.log" | tee -a "$OUT"
  echo "[$name rc=$rc]" | tee -a "$OUT"
}

# I3D batch-unroll A/B (VERDICT r4 item 1 fix candidate)
run unroll   python tools/bench_batch_scaling.py --batches 1,4 \
             --components i3d --overrides model.rgb.i3d_batch_unroll=true
# full forward with the unroll lever on, b sweep
run fullswp  python tools/bench_batch_scaling.py --batches 1,2,4 \
             --components full --overrides model.rgb.i3d_batch_unroll=true
# post-gather-unroll sparse/lidar re-measure (item 1)
run sparse   python tools/bench_batch_scaling.py --batches 1,4 \
             --components sparse,lidar
# b1 per-component ms under current defaults -> roofline input
run b1comp   python tools/bench_batch_scaling.py --batches 1 \
             --components full,stem,i3d,rgb,lidar
# roofline accounting (items 2/8)
run roofline python tools/roofline.py --ms-jsonl "$MS"
echo "queue done" | tee -a "$OUT"
