#!/bin/bash
# Round-5 hardware measurement queue (run when the TPU tunnel is up).
# Sequential (single host core); each step logs to /tmp/hwq_*.log and
# appends a summary line here-below for docs/ROUND5_NOTES.md.
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

# band sparse-conv kernel A/B (VERDICT r4 item 4)
run band    python tools/bench_band_kernel.py
# temporal-cone cull A/B (item 3)
run cull    python tools/bench_batch_scaling.py --batches 1,4 \
            --components stem,i3d --overrides model.rgb.i3d_center_slice=true
# batch-scaling localization: backbone vs pool (item 1)
run scaling python tools/bench_batch_scaling.py --batches 1,4 \
            --components sparse,lidar
# roofline accounting (item 2)
run roofline python tools/roofline.py --ms-jsonl /tmp/batch_scaling_r5.jsonl
# flagship bench (headline + b8 retry, item 6)
run bench   python bench.py
echo "queue done" | tee -a "$OUT"
