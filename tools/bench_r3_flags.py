"""Round-3 flag experiments at the flagship working point (one chip).

Measures eval clips/s for each perf flag introduced this round against the
round-2 baseline configuration:
  - base_r2: x_window off, t2d off (the BENCH_r02 configuration + the
    landed Pallas stem / folded BN)
  - xwin: x-window sparse-conv gathers (data/rulebook.py packed maps)
  - t2d: I3D (3,3,3) convs as 3 shifted native 2D convs
  - xwin+t2d: both

Usage: python tools/bench_r3_flags.py [names...]
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench


def patch(x_window: bool, t2d: bool, pool_approx: bool = False,
          fused: bool = False, bf16_body: bool = False,
          pallas_stem: bool = True):
    def p(cfg):
        model = dataclasses.replace(
            cfg.model,
            lidar=dataclasses.replace(cfg.model.lidar, x_window=x_window,
                                      x_window_fused=fused,
                                      pool_approx_nsample=pool_approx),
            rgb=dataclasses.replace(cfg.model.rgb, i3d_t2d=t2d,
                                    i3d_bf16_body=bf16_body,
                                    pallas_stem=pallas_stem))
        return dataclasses.replace(cfg, model=model)
    return p


VARIANTS = {
    "base_r2": patch(False, False),
    "xwin": patch(True, False),
    "t2d": patch(False, True),
    "xwin+t2d": patch(True, True),
    "xwin+poolapprox": patch(True, False, pool_approx=True),
    # round-4 stem-timing finding: on this Mosaic toolchain the Pallas stem
    # is slower than XLA's DEFAULT-precision conv (25.8 vs 21.0 ms) AND no
    # more accurate (both 1xbf16-class) — measure the kernel OFF
    "xwin+poolapprox+nostem": patch(True, False, pool_approx=True,
                                    pallas_stem=False),
    "xwin+bf16body": patch(True, False, bf16_body=True),
    "xwin+poolapprox+bf16body": patch(True, False, pool_approx=True,
                                      bf16_body=True),
    # fused kernel: uncompilable on this image's Mosaic (dynamic_gather
    # crashes the compile helper beyond one tile — see window_conv.py).
    # Not in the default sweep; invoke by name when the toolchain updates.
    "xwin+fused": patch(True, False, fused=True),
}
DEFAULT_SWEEP = [n for n in VARIANTS if "fused" not in n]


def main():
    names = sys.argv[1:] or DEFAULT_SWEEP
    results = {}
    for name in names:
        try:
            v = bench.eval_throughput(1, cfg_patch=VARIANTS[name])
            results[name] = round(v, 3)
            print(f"{name}: {v:.2f} clips/s", flush=True)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            results[name] = None
    print(json.dumps(results))


if __name__ == "__main__":
    main()
