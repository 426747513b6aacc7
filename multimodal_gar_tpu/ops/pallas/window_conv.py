"""Pallas TPU kernel: fused x-window submanifold sparse-conv layer.

The XLA x-window path (models/sparse_backbone.window_gather) cuts the 27 row
gathers per query to 9 wide ones, but each still runs as an HBM gather
(~15% of HBM peak measured) and the (R, 9, 3C) gathered tensor round-trips
HBM before the tap-select and tap GEMM. This kernel fuses the whole layer
in VMEM.

Mosaic lowers exactly ONE gather shape (jax _gather_lowering_rule →
``tpu.dynamic_gather``): 2D ``take_along_axis`` where table, indices and
output shapes all match. A submanifold conv fits it exactly — output rows ==
input rows == M — so the kernel runs one full-table (M, 3C) dynamic gather
per window slot (grid over the 9 slots, output block revisited and
accumulated):

  per slot p: g = take_along_axis(wt, pos[:, p] broadcast, axis=0)
              for dx in 0..2: out += (slot==dx ? g[:, dx*C:(dx+1)*C]) @ W[3p+dx]

The earlier formulation (jnp.take with R*9 flat indices, round-3) can never
lower — Mosaic rejects mismatched gather shapes ("Shape mismatch in input,
indices and output", observed on hardware round 4).

HARDWARE STATUS (round 4, measured): this image's Mosaic toolchain CRASHES
(tpu_compile_helper exit 1) on tpu.dynamic_gather beyond one tile — axis-0
gathers compile only at m==8 (one sublane tile) and axis-1 only at exactly
128 lanes with small m (tools/probe_gather.py probe E; standalone shape
sweep in docs/ROUND4_NOTES.md). A cross-row gather over a 16k-row VMEM
table is therefore uncompilable here, so ``x_window_fused`` stays
default-off and the XLA x-window path (1.57x end-to-end, measured) remains
production. The kernel is interpret-validated and parity-tested for when
the toolchain catches up.

Reference semantics: spconv SubMConv3d (pcdet spconv_backbone.py:12-27).
Parity: tests/test_sparse_xwindow.py (interpret mode + vs window_gather).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..voxel import WINDOW_POS_BITS, WINDOW_POS_MASK, shifted_window_table


def _kernel(wt_ref, pos_ref, sel_ref, w_ref, o_ref, *, c: int, d: int):
    """One window slot p: full-table dynamic gather + 3 masked tap GEMMs."""
    p = pl.program_id(0)
    wt = wt_ref[...]                                     # (M, 3C)
    idx2d = jnp.broadcast_to(pos_ref[...], wt.shape)     # (M, 1) -> (M, 3C)
    g = jnp.take_along_axis(wt, idx2d, axis=0)           # tpu.dynamic_gather
    sel = sel_ref[...]                                   # (M, 1) int32
    acc = jnp.zeros((wt.shape[0], d), jnp.float32)
    for wdx in range(3):
        slot = (sel >> (2 * wdx)) & 3                    # (M, 1) in {0..3}
        tap = jnp.zeros((wt.shape[0], c), wt.dtype)
        for j in range(3):
            mask = (slot == j).astype(wt.dtype)          # 3 = absent -> all 0
            tap = tap + g[:, j * c:(j + 1) * c] * mask
        acc = acc + jnp.dot(tap, w_ref[wdx],
                            preferred_element_type=jnp.float32)

    @pl.when(p == 0)
    def _init():
        o_ref[...] = acc.astype(o_ref.dtype)

    @pl.when(p > 0)
    def _accum():
        o_ref[...] = o_ref[...] + acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def window_conv_pallas(features: jnp.ndarray, win: jnp.ndarray,
                       weights: jnp.ndarray,
                       interpret: bool | None = None) -> jnp.ndarray:
    """Fused x-window submanifold sparse-conv layer.

    Args:
      features: (M, C) voxel features in linear-key order (padded last).
      win: (M, 9) packed int32 x-window maps (data/rulebook.py) — the
        submanifold case: one output row per table row.
      weights: (27, C, D) tap weights in (dz, dy, dx) scan order.
    Returns:
      (M, D) float32 outputs (zeros at absent taps / padded queries).
    """
    m, c = features.shape
    r = win.shape[0]
    d = weights.shape[-1]
    assert r == m, ("fused x-window kernel is submanifold-only "
                    f"(output rows {r} != table rows {m})")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    wt = shifted_window_table(features)                  # (M, 3C)
    pos = (win & WINDOW_POS_MASK).astype(jnp.int32)      # (M, 9)
    sel = (win >> WINDOW_POS_BITS).astype(jnp.int32)     # (M, 9)

    return pl.pallas_call(
        functools.partial(_kernel, c=c, d=d),
        grid=(9,),
        in_specs=[
            pl.BlockSpec((m, 3 * c), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),       # resident table
            pl.BlockSpec((m, 1), lambda p: (0, p),
                         memory_space=pltpu.VMEM),       # slot-p positions
            pl.BlockSpec((m, 1), lambda p: (0, p),
                         memory_space=pltpu.VMEM),       # slot-p selectors
            pl.BlockSpec((3, c, d), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),       # slot-p tap weights
        ],
        out_specs=pl.BlockSpec((m, d), lambda p: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(wt, pos, sel, weights)
