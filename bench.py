"""Benchmark: full MGAR inference throughput (clips/sec) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context (BASELINE.md): the reference publishes no timing numbers; the
driver target is >=5x clips/sec over a CPU baseline. We measure the full
multimodal eval forward (I3D + RoIAlign + sparse backbone + ROI grid pool +
DAFM + heads) at flagship-like shapes on the default device and report
clips/sec/chip; vs_baseline is the speedup over a CPU-measured baseline of the
same program (measured once and pinned below).
"""
from __future__ import annotations

import json
import time

# Pinned single-core CPU baseline of this exact benchmark program, measured on
# the dev host (1 core): 3 jitted iterations of the flagship eval forward.
CPU_BASELINE_CLIPS_PER_SEC = 0.0577


def build():
    import jax
    from __graft_entry__ import entry
    fn, (variables, batch) = entry()
    jit_fn = jax.jit(fn)
    return jit_fn, variables, batch


def run(iters: int = 50, warmup: int = 3):
    import jax
    jit_fn, variables, batch = build()
    variables = jax.device_put(variables)
    batch = jax.device_put(batch)
    # warmup / compile
    for _ in range(warmup):
        out = jit_fn(variables, batch)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jit_fn(variables, batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    clips = batch.images.shape[0] * iters
    return clips / dt


def main():
    cps = run()
    print(json.dumps({
        "metric": "clips_per_sec_per_chip",
        "value": round(cps, 4),
        "unit": "clips/s",
        "vs_baseline": round(cps / CPU_BASELINE_CLIPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
