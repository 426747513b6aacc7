"""On-chip probe + A/B of the scalar-prefetch band sparse-conv kernel.

VERDICT r4 item 4: does window_conv_band (ops/pallas/window_conv.py) compile
on THIS image's Mosaic (no dynamic_gather — band DMA + one-hot MXU matmul),
and how does one fused submanifold layer compare against the XLA x-window
path (window_gather + slot-select einsum + tap GEMM) at flagship shapes?

Prints one JSON line per (shape, variant): parity max-abs-diff + chained
per-call ms (bench.py methodology). Run with the tunnel up.

Usage: python tools/bench_band_kernel.py [--shapes 40000:16,40000:32,20000:64,10000:64]
       [--band 640] [--qb 128] [--k 12]
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from multimodal_gar_tpu.data.rulebook import build_rulebook
from multimodal_gar_tpu.models.sparse_backbone import window_gather
from multimodal_gar_tpu.ops.pallas.window_conv import (band_spread_ok,
                                                       window_conv_band)


def timed_chain(fn, args, k=12, iters=2):
    """fn(args)->(scalar, args'). Chained-in-jit per-call seconds."""
    @partial(jax.jit, static_argnames=("kk",))
    def chained(args, kk):
        def body(i, carry):
            a, acc = carry
            s, a2 = fn(a)
            return (a2, acc + s)
        _, acc = jax.lax.fori_loop(0, kk, body, (args, jnp.float32(0)))
        return acc

    def run(kk):
        float(chained(args, kk))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(chained(args, kk))
        return (time.perf_counter() - t0) / iters

    t1 = run(1)
    tk = run(k)
    return max((tk - t1) / (k - 1), 1e-9)


def synth_rulebook(m_valid, cap, seed=0):
    """Clustered flagship-like coords -> (win_0 map, order, n)."""
    rng = np.random.default_rng(seed)
    shape = (41, 2000, 2000)
    centers = rng.uniform([5, 100, 100], [35, 1900, 1900], size=(30, 3))
    pts = (centers[rng.integers(0, 30, m_valid)]
           + rng.normal(0, [3, 15, 15], (m_valid, 3))).astype(np.int64)
    pts = np.clip(pts, 0, np.array(shape) - 1).astype(np.int32)
    keys = (pts[:, 0].astype(np.int64) * shape[1] + pts[:, 1]) * shape[2] \
        + pts[:, 2]
    _, idx = np.unique(keys, return_index=True)
    pts = pts[np.sort(idx)]
    n = len(pts)
    cpad = np.full((cap, 3), -1, np.int32)
    cpad[:n] = pts
    rb = build_rulebook(cpad, n, shape, (cap, cap, cap // 2, cap // 4),
                        x_window=True)
    return rb["win_0"], rb["order_0"], n


def main():
    argv = sys.argv[1:]

    def arg(flag, default):
        return argv[argv.index(flag) + 1] if flag in argv else default

    shapes = [tuple(int(v) for v in s.split(":"))
              for s in arg("--shapes", "40000:16,40000:32,20000:64").split(",")]
    band = int(arg("--band", "640"))
    qb = int(arg("--qb", "128"))
    k = int(arg("--k", "12"))
    d_mult = 1

    for cap, c in shapes:
        d = c * d_mult
        win_np, order, n = synth_rulebook(cap // 2, cap, seed=cap + c)
        print(json.dumps({"shape": f"{cap}:{c}", "n_valid": n,
                          "spread_ok": band_spread_ok(win_np, band, qb)}),
              flush=True)
        rng = np.random.default_rng(1)
        feats = jnp.asarray(rng.normal(size=(cap, c)).astype(np.float32))
        w = jnp.asarray((rng.normal(size=(27, c, d)) * 0.1).astype(np.float32))
        win = jnp.asarray(win_np)

        def xla_fn(args):
            f, = args
            out = jnp.einsum("rkc,kcd->rd", window_gather(f, win), w)
            s = jnp.sum(out)
            return s, (f + 0.0 * s,)

        def band_fn(args):
            f, = args
            out = window_conv_band(f, win, w, band=band, qb=qb,
                                   interpret=False)
            s = jnp.sum(out)
            return s, (f + 0.0 * s,)

        # parity on chip first (also the compile go/no-go)
        try:
            ref = jnp.einsum("rkc,kcd->rd", window_gather(feats, win), w)
            out = window_conv_band(feats, win, w, band=band, qb=qb,
                                   interpret=False)
            diff = float(jnp.max(jnp.abs(out - ref)))
            rel = diff / max(float(jnp.max(jnp.abs(ref))), 1e-9)
            print(json.dumps({"shape": f"{cap}:{c}", "parity_maxabs": diff,
                              "parity_rel": rel}), flush=True)
        except Exception as e:
            msg = str(e).splitlines()[-1][-300:] if str(e) else repr(e)
            print(json.dumps({"shape": f"{cap}:{c}", "compile_error": msg}),
                  flush=True)
            continue

        for name, fn in (("xla_xwindow", xla_fn), ("pallas_band", band_fn)):
            try:
                sec = timed_chain(fn, (feats,), k=k)
                print(json.dumps({"shape": f"{cap}:{c}", "variant": name,
                                  "ms": round(sec * 1e3, 3)}), flush=True)
            except Exception as e:
                msg = str(e).splitlines()[-1][-300:] if str(e) else repr(e)
                print(json.dumps({"shape": f"{cap}:{c}", "variant": name,
                                  "error": msg}), flush=True)


if __name__ == "__main__":
    main()
