"""Benchmark: full MGAR inference throughput (clips/sec) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing methodology: the remote-TPU transport has ~30-100 ms per-call
round-trip latency and block_until_ready does not reliably await execution,
so naive dispatch-loop timing is invalid (it "measured" 23 PFLOP/s). Instead
K forward passes are chained *inside one jit* (each iteration's input depends
on the previous output, forcing serial execution) with a single scalar
transfer at the end; per-clip time = (t_K - t_1) / (K - 1).

Baseline: the reference publishes no timing numbers (BASELINE.md); the driver
target is >=5x clips/sec over a CPU baseline. vs_baseline is the speedup over
the pinned single-core CPU measurement of this same chained program.
"""
from __future__ import annotations

import json
import time
from functools import partial

# Pinned single-core CPU baseline of this chained benchmark at the full-res
# flagship config: 0.0073 clips/s = 137 s/clip (re-measure with
# `python bench.py --cpu-baseline`; takes ~1 h on the 1-core host).
CPU_BASELINE_CLIPS_PER_SEC = 0.0073


def build():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    fn, (variables, batch) = entry()

    @partial(jax.jit, static_argnames=("k",))
    def chained(variables, batch, k):
        def body(i, carry):
            b, acc = carry
            out = fn(variables, b)
            s = out.card[0, 0]
            # serialize: EVERY branch input must depend on the previous
            # output, or XLA hoists that branch out of the loop as
            # loop-invariant (observed: perturbing only images let the whole
            # LiDAR path run once, inflating clips/s 10x)
            b = b.replace(images=b.images + 0.0 * s,
                          voxels=b.voxels + 0.0 * s,
                          boxes2d=b.boxes2d + 0.0 * s,
                          boxes3d=b.boxes3d + 0.0 * s)
            return (b, acc + s)

        _, acc = jax.lax.fori_loop(0, k, body, (batch, jnp.float32(0)))
        return acc

    return chained, variables, batch


def _timed(chained, variables, batch, k: int, iters: int = 3) -> float:
    float(chained(variables, batch, k))      # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        float(chained(variables, batch, k))  # scalar transfer forces completion
    return (time.perf_counter() - t0) / iters


def run(k: int = 40) -> float:
    chained, variables, batch = build()
    t1 = _timed(chained, variables, batch, 1)
    tk = _timed(chained, variables, batch, k)
    per_clip = max((tk - t1) / (k - 1), 1e-9)
    return batch.images.shape[0] / per_clip


def main():
    import sys
    if "--cpu-baseline" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
        cps = run(k=4)
        print(f"cpu baseline clips/s: {cps:.4f}")
        return
    cps = run()
    print(json.dumps({
        "metric": "clips_per_sec_per_chip",
        "value": round(cps, 4),
        "unit": "clips/s",
        "vs_baseline": round(cps / CPU_BASELINE_CLIPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
