"""Per-endpoint I3D timing on the real TPU: where do the ~47 ms go?

Times the flagship I3D (15x720x1280 clip) truncated at successive endpoints
with the chained-in-jit methodology (see bench.py). Differences between
consecutive rows = the cost of that endpoint group. Variants: f32 (default
config: Pallas stem + folded BN) and bf16 (XLA s2d stem — the Pallas stem
kernel is f32-only). The split picks the next optimization target for the
I3D hot path (reference gat_model.py:1048, backbone.py:238+).

Usage: python tools/bench_i3d_split.py [f32|bf16 ...] [--batches 1,4]
       [--cull]

--batches: comma list of batch sizes; per-clip deltas (cum/B) are printed so
super-linear endpoint groups are directly visible (VERDICT r5 item 1: the
body inflates 1.5x per clip at b4 — this names the endpoint responsible).
--cull: temporal-cone culled body (InceptionI3d.center_slice) for the
Mixed_4f-terminated rows (only valid endpoint for the culled path).
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from multimodal_gar_tpu.models.i3d import InceptionI3d

ENDPOINTS = ["Conv3d_1a_7x7", "MaxPool3d_2a_3x3", "Conv3d_2c_3x3",
             "MaxPool3d_3a_3x3", "Mixed_3c", "MaxPool3d_4a_3x3", "Mixed_4f"]


def timed_chain(fn, variables, x, k=12, iters=2):
    @partial(jax.jit, static_argnames=("kk",))
    def chained(variables, x, kk):
        def body(i, carry):
            xx, acc = carry
            s = fn(variables, xx)
            return (xx + (0.0 * s).astype(xx.dtype), acc + s)
        _, acc = jax.lax.fori_loop(0, kk, body, (x, jnp.float32(0)))
        return acc

    def run(kk):
        float(chained(variables, x, kk))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(chained(variables, x, kk))
        return (time.perf_counter() - t0) / iters

    return (run(k) - run(1)) / (k - 1)


def main():
    args = sys.argv[1:]
    batches = [1]
    cull = False
    if "--cull" in args:
        cull = True
        args.remove("--cull")
    if "--batches" in args:
        i = args.index("--batches")
        batches = [int(b) for b in args[i + 1].split(",")]
        del args[i:i + 2]
    variants = args or ["f32", "bf16"]
    rng = np.random.default_rng(0)
    results = {}
    for variant in variants:
        dtype = jnp.bfloat16 if variant == "bf16" else jnp.float32
        for bsz in batches:
            x = jnp.asarray(rng.normal(size=(bsz, 15, 720, 1280, 3))
                            .astype(np.float32))
            prev = 0.0
            rows = {}
            for ep in ENDPOINTS:
                model = InceptionI3d(final_endpoint=ep, dtype=dtype,
                                     center_slice=cull and ep == "Mixed_4f")
                variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

                def fn(variables, xx):
                    out = model.apply(variables, xx, train=False)
                    return jnp.sum(out.astype(jnp.float32))

                try:
                    t = timed_chain(fn, variables, x) * 1e3 / bsz
                except Exception as e:
                    print(f"{variant} b{bsz} {ep} FAILED: {str(e)[:200]}",
                          flush=True)
                    break
                rows[ep] = {"cum_ms": round(t, 2),
                            "delta_ms": round(t - prev, 2)}
                prev = t
                print(f"{variant:5s} b{bsz} {ep:20s} cum={t:7.2f} ms/clip "
                      f"delta={rows[ep]['delta_ms']:7.2f} ms/clip",
                      flush=True)
            results[f"{variant}_b{bsz}"] = rows
    print("SPLIT " + json.dumps(results))


if __name__ == "__main__":
    main()
