"""Mosaic feasibility + timing probes for in-kernel VMEM row gathers.

The sparse backbone's gather-GEMM layers spend their time in XLA row
gathers (bench_sparse.py). A fused Pallas subm-conv kernel needs to
gather feature rows from a VMEM-resident table with dynamic indices;
Mosaic support for that is undocumented (pallas_guide.md has no gather
section), so probe it empirically:

  A. jnp.take(table, idx, axis=0) inside a kernel (table whole-array in
     VMEM, idx (R,) int32);
  B. take per tap + accumulate GEMM (the fused subm-conv inner loop);
  C. XLA reference timing of the same gather (outside Pallas);
  D. XLA gather cost model: rows vs bytes (does time scale with the row
     count or the row width?);
  W. the production-candidate fused x-window layer
     (ops/pallas/window_conv.py) vs the XLA window_gather path + parity.

Timing: K iterations chained inside ONE jit (every iteration's input
data-dependent on the previous output) minus the k=1 time — the remote
tunnel makes dispatch-loop timing invalid (CLAUDE.md / bench.py).

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


def timed_chain(fn, k=12, iters=2, *args):
    """fn(tab, *args) -> scalar; tab is perturbed by 0*scalar per step."""

    @partial(jax.jit, static_argnames=("kk",))
    def chained(tab, args, kk):
        def body(i, carry):
            t, acc = carry
            s = fn(t, *args)
            return (t + (0.0 * s).astype(t.dtype), acc + s)

        _, acc = jax.lax.fori_loop(0, kk, body, (tab, jnp.float32(0)))
        return acc

    def run(tab, kk):
        float(chained(tab, args, kk))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(chained(tab, args, kk))
        return (time.perf_counter() - t0) / iters

    def measure(tab):
        t1, tk = run(tab, 1), run(tab, k)
        return (tk - t1) / (k - 1)

    return measure


def probe_a():
    """Plain row gather from a VMEM table inside a kernel."""

    def kern(tab_ref, idx_ref, o_ref):
        g = jnp.take(tab_ref[...], idx_ref[...].reshape(-1), axis=0)
        o_ref[...] = g.reshape(RB, K3 * C)

    def call(tab, idx):
        out = pl.pallas_call(
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
        return jnp.sum(out.ravel()[::4097])

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, M, (M, K3)).astype(np.int32))
    t = timed_chain(call, 12, 2, idx)(tab)
    print(f"A: in-kernel take gather (M={M}, K3={K3}, C={C}): {t*1e3:.3f} ms",
          flush=True)


def probe_b():
    """Fused gather + tap GEMM accumulate (the fused subm-conv shape)."""

    def kern(tab_ref, idx_ref, w_ref, o_ref):
        tab = tab_ref[...]
        acc = jnp.zeros((RB, D), jnp.float32)
        for k in range(K3):
            g = jnp.take(tab, idx_ref[:, k], axis=0)
            acc += jnp.dot(g, w_ref[k], preferred_element_type=jnp.float32)
        o_ref[...] = acc

    def call(tab, idx, w):
        out = pl.pallas_call(
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
        return jnp.sum(out[:, 0])

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, M, (M, K3)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(K3, C, D)).astype(np.float32) * 0.1)
    t = timed_chain(call, 12, 2, idx, w)(tab)
    print(f"B: fused gather+GEMM (M={M}, K3={K3}, C={C}, D={D}): "
          f"{t*1e3:.3f} ms", flush=True)


def probe_c():
    """XLA reference: same gather + einsum."""

    def call(tab, idx, w):
        g = tab[idx]
        return jnp.sum(jnp.einsum("mkc,kcd->md", g, w)[:, 0])

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, M, (M, K3)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(K3, C, D)).astype(np.float32) * 0.1)
    t = timed_chain(call, 12, 2, idx, w)(tab)
    print(f"C: XLA gather+einsum: {t*1e3:.3f} ms", flush=True)


def probe_d():
    """XLA gather cost model: rows vs bytes."""
    rng = np.random.default_rng(0)
    for rows, width in [(27, 16), (9, 48), (27, 64), (9, 192), (27, 4),
                        (9, 128)]:
        tab = jnp.asarray(rng.normal(size=(M, width)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, M, (M, rows)).astype(np.int32))

        def call(tab, idx):
            return jnp.sum(tab[idx].sum(axis=1)[:, 0])

        t = timed_chain(call, 12, 2, idx)(tab)
        print(f"D: XLA gather rows/query={rows} width={width} "
              f"(bytes={M*rows*width*4>>20} MB): {t*1e3:.3f} ms", flush=True)


def probe_w():
    """Fused x-window Pallas layer vs the XLA window_gather path."""
    from multimodal_gar_tpu.models.sparse_backbone import window_gather
    from multimodal_gar_tpu.ops.pallas.window_conv import window_conv_pallas

    rng = np.random.default_rng(0)
    m, c, d = 16000, 32, 32
    feats = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32))
    pos = rng.integers(0, m, (m, 9)).astype(np.int32)
    sel = rng.integers(0, 3, (m, 9, 3))
    packed = pos | ((sel[..., 0] | (sel[..., 1] << 2)
                     | (sel[..., 2] << 4)) << 20)
    win = jnp.asarray(packed.astype(np.int32))
    w = jnp.asarray(rng.normal(size=(27, c, d)).astype(np.float32) * 0.1)

    def xla_call(feats, win, w):
        out = jnp.einsum("rkc,kcd->rd", window_gather(feats, win), w)
        return jnp.sum(out[:, 0])

    t = timed_chain(xla_call, 12, 2, win, w)(feats)
    print(f"W: XLA window_gather+einsum (M={m}, C={c}, D={d}): "
          f"{t*1e3:.3f} ms", flush=True)

    def pallas_call_fn(feats, win, w):
        out = window_conv_pallas(feats, win, w)
        return jnp.sum(out[:, 0])

    t = timed_chain(pallas_call_fn, 12, 2, win, w)(feats)
    print(f"W: Pallas fused window conv: {t*1e3:.3f} ms", flush=True)

    a = np.asarray(jnp.einsum("rkc,kcd->rd", window_gather(feats, win), w))
    b = np.asarray(window_conv_pallas(feats, win, w))
    err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print(f"W: rel max err vs XLA: {err:.2e}", flush=True)


def probe_e():
    """tpu.dynamic_gather via take_along_axis — the ONLY gather shape the
    Mosaic lowering supports (jax _gather_lowering_rule: 2D, input shape ==
    indices shape == output shape, gather along dim 0/1). The x-window
    submanifold conv fits it exactly (output rows == table rows), so if this
    is fast, the fused kernel is viable; probes A/B/W used jnp.take with
    mismatched shapes, which can never lower."""
    rng = np.random.default_rng(0)
    for m, width in [(16384, 32), (16384, 48), (16384, 128), (40960, 48)]:
        def kern(tab_ref, idx_ref, o_ref):
            idx2d = jnp.broadcast_to(idx_ref[...], tab_ref.shape)
            o_ref[...] = jnp.take_along_axis(tab_ref[...], idx2d, axis=0)

        def call(tab, idx):
            out = pl.pallas_call(
                kern,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((m, width), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(tab, idx)
            return jnp.sum(out.ravel()[::4097])

        tab = jnp.asarray(rng.normal(size=(m, width)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, m, (m, 1)).astype(np.int32))
        # correctness first
        got = np.asarray(pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, width), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(tab, idx))
        ref = np.asarray(tab)[np.asarray(idx)[:, 0]]
        err = np.abs(got - ref).max()
        t = timed_chain(call, 12, 2, idx)(tab)
        print(f"E: dynamic_gather (M={m}, W={width}, "
              f"{m*width*4>>20} MB): {t*1e3:.3f} ms  maxerr={err:.1e}",
              flush=True)


def probe_f():
    """Fused 9-slot x-window conv with dynamic_gather: per slot p,
    take_along_axis over the full (M, 3C) shifted table + 3 masked tap
    GEMMs. Shapes chosen to mirror stage 2 at the 16k cap."""
    m, c, d = 16384, 32, 32

    def kern(wt_ref, pos_ref, sel_ref, w_ref, o_ref):
        wt = wt_ref[...]                           # (M, 3C)
        acc = jnp.zeros((m, d), jnp.float32)
        for p in range(9):
            idx2d = jnp.broadcast_to(pos_ref[:, p][:, None], wt.shape)
            g = jnp.take_along_axis(wt, idx2d, axis=0)   # (M, 3C)
            g3 = g.reshape(m, 3, c)
            slot = (sel_ref[:, p][:, None] >> (2 * jnp.arange(3))) & 3
            for wdx in range(3):
                # tap[m, c] = g3[m, slot[m, wdx], c] via a 3-way one-hot
                onehot = (slot[:, wdx][:, None]
                          == jnp.arange(3)).astype(jnp.float32)   # (M, 3)
                tap = jnp.einsum("mjc,mj->mc", g3, onehot)
                acc += jnp.dot(tap, w_ref[p * 3 + wdx],
                               preferred_element_type=jnp.float32)
        o_ref[...] = acc

    def call(tab, pos, sel, w):
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, d), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(tab, pos, sel, w)
        return jnp.sum(out[:, 0])

    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(m, 3 * c)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, m, (m, 9)).astype(np.int32))
    sel = jnp.asarray(rng.integers(0, 64, (m, 9)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(27, c, d)).astype(np.float32) * 0.1)
    t = timed_chain(call, 12, 2, pos, sel, w)(tab)
    print(f"F: fused dyn-gather window conv (M={m}, C={c}, D={d}): "
          f"{t*1e3:.3f} ms", flush=True)


def main():
    for name, fn in [("C", probe_c), ("D", probe_d), ("A", probe_a),
                     ("B", probe_b), ("W", probe_w), ("E", probe_e),
                     ("F", probe_f)]:
        try:
            fn()
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:400]}",
                  flush=True)


if __name__ == "__main__":
    main()
