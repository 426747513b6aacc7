"""Mosaic feasibility + timing probes for in-kernel VMEM row gathers.

The sparse backbone's gather-GEMM layers spend their time in XLA row
gathers (bench_sparse.py). A fused Pallas subm-conv kernel needs to
gather feature rows from a VMEM-resident table with dynamic indices;
Mosaic support for that is undocumented (pallas_guide.md has no gather
section), so probe it empirically:

  A. jnp.take(table, idx, axis=0) inside a kernel (table whole-array in
     VMEM, idx (R,) int32);
  B. take per tap + accumulate GEMM (the fused subm-conv inner loop);
  C. XLA reference timing of the same gather (outside Pallas).

Usage: python tools/probe_gather.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, C, D, RB, K3 = 16384, 32, 32, 1024, 27


def timed(fn, *args, iters=20):
    r = fn(*args)
    jax.block_until_ready(r)
    # chained timing is overkill for standalone kernels; do many dispatches
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def probe_a():
    """Plain row gather from a VMEM table inside a kernel."""

    def kern(tab_ref, idx_ref, o_ref):
        tab = tab_ref[...]
        idx = idx_ref[...]                       # (RB, K3)
        g = jnp.take(tab, idx.reshape(-1), axis=0)
        o_ref[...] = g.reshape(RB, K3 * C)

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kern,
            grid=(M // RB,),
            in_specs=[
                pl.BlockSpec((M, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RB, K3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RB, K3 * C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, K3 * C), jnp.float32),
        )(tab, idx)

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, M, (M, K3)).astype(np.int32))
    t = timed(run, tab, idx)
    print(f"A: in-kernel take gather (M={M}, K3={K3}, C={C}): {t*1e3:.3f} ms",
          flush=True)


def probe_b():
    """Fused gather + tap GEMM accumulate (the subm-conv inner loop)."""

    def kern(tab_ref, idx_ref, w_ref, o_ref):
        tab = tab_ref[...]
        acc = jnp.zeros((RB, D), jnp.float32)
        for k in range(K3):
            rows = idx_ref[:, k]
            g = jnp.take(tab, rows, axis=0)      # (RB, C)
            acc += jnp.dot(g, w_ref[k],
                           preferred_element_type=jnp.float32)
        o_ref[...] = acc

    @jax.jit
    def run(tab, idx, w):
        return pl.pallas_call(
            kern,
            grid=(M // RB,),
            in_specs=[
                pl.BlockSpec((M, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((RB, K3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K3, C, D), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RB, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, D), jnp.float32),
        )(tab, idx, w)

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, M, (M, K3)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(K3, C, D)).astype(np.float32) * 0.1)
    t = timed(run, tab, idx, w)
    print(f"B: fused gather+GEMM (M={M}, K3={K3}, C={C}, D={D}): "
          f"{t*1e3:.3f} ms", flush=True)


def probe_c():
    """XLA reference: same gather, then the einsum."""

    @jax.jit
    def run(tab, idx, w):
        g = tab[idx]                             # (M, K3, C)
        return jnp.einsum("mkc,kcd->md", g, w)

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, M, (M, K3)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(K3, C, D)).astype(np.float32) * 0.1)
    t = timed(run, tab, idx, w)
    print(f"C: XLA gather+einsum: {t*1e3:.3f} ms", flush=True)
    # parity check vs B's math
    g = tab[idx]
    ref = jnp.einsum("mkc,kcd->md", g, w)
    return ref


def probe_d():
    """XLA gather cost model: rows vs bytes.

    If time is per-row-bound (narrow ~= wide), the x-window reformulation
    (9 gathers of 3C-wide rows instead of 27 of C-wide) wins ~3x.
    """
    rng = np.random.default_rng(0)
    for rows, width in [(27, 16), (9, 48), (27, 64), (9, 192), (27, 4),
                        (9, 128)]:
        tab = jnp.asarray(rng.normal(size=(M, width)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, M, (M, rows)).astype(np.int32))

        @jax.jit
        def run(tab, idx):
            return tab[idx].sum(axis=1)          # (M, width)

        t = timed(run, tab, idx)
        print(f"D: XLA gather rows/query={rows} width={width} "
              f"(bytes={M*rows*width*4>>20} MB): {t*1e3:.3f} ms", flush=True)


def probe_w():
    """Fused x-window Pallas layer vs the XLA window_gather path."""
    from multimodal_gar_tpu.models.sparse_backbone import window_gather
    from multimodal_gar_tpu.ops.pallas.window_conv import window_conv_pallas

    rng = np.random.default_rng(0)
    m, c, d = 16000, 32, 32
    feats = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32))
    # synthetic packed maps: valid positions + random slot selectors
    pos = rng.integers(0, m, (m, 9)).astype(np.int32)
    sel = rng.integers(0, 3, (m, 9, 3))
    packed = pos | ((sel[..., 0] | (sel[..., 1] << 2)
                     | (sel[..., 2] << 4)) << 20)
    win = jnp.asarray(packed.astype(np.int32))
    w = jnp.asarray(rng.normal(size=(27, c, d)).astype(np.float32) * 0.1)

    @jax.jit
    def xla_path(feats, win, w):
        return jnp.einsum("rkc,kcd->rd", window_gather(feats, win), w)

    t = timed(xla_path, feats, win, w)
    print(f"W: XLA window_gather+einsum (M={m}, C={c}, D={d}): "
          f"{t*1e3:.3f} ms", flush=True)
    t = timed(lambda f, wn, ww: window_conv_pallas(f, wn, ww), feats, win, w)
    print(f"W: Pallas fused window conv: {t*1e3:.3f} ms", flush=True)
    # parity on hardware
    a = np.asarray(xla_path(feats, win, w))
    b = np.asarray(window_conv_pallas(feats, win, w))
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print(f"W: rel max err vs XLA: {err:.2e}", flush=True)


def main():
    for name, fn in [("C", probe_c), ("D", probe_d), ("A", probe_a),
                     ("B", probe_b), ("W", probe_w)]:
        try:
            fn()
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:400]}",
                  flush=True)


if __name__ == "__main__":
    main()
