"""Pallas TPU kernel: fused x-window sparse-conv layer.

The XLA x-window path (models/sparse_backbone.window_gather) already cuts
the 27 row gathers per query to 9 wide ones, but each gather still runs as
an XLA HBM gather (~5-6 cycles/row) and the (R, 9, 3C) gathered tensor
round-trips HBM before the tap-select and the tap GEMM. This kernel fuses
the whole layer:

  - the 3C-wide shifted window table stays RESIDENT IN VMEM (<= ~6 MB at
    flagship shapes) across all row blocks;
  - per (RB=400)-row block: positions/selectors are unpacked from the
    host's packed int32 maps, rows are gathered from the VMEM table with
    jnp.take, dx taps are resolved by slot one-hots, and ONE GEMM
    (RB, 27C) x (27C, D) produces the block's outputs;
  - the f32 GEMM is left to Mosaic's multi-pass emulation — at (400, 1728,
    64) the MXU time is noise next to the gather.

STATUS: logic parity-tested in interpret mode (tests/test_sparse_xwindow);
whether Mosaic lowers the in-kernel VMEM gather (and how fast) is pending
hardware validation (tools/probe_gather.py probes A/B) — the production
path keeps the XLA formulation until then. Reference semantics:
spconv SubMConv3d/SparseConv3d, pcdet spconv_backbone.py:12-27.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..voxel import WINDOW_POS_MASK, shifted_window_table


def _kernel(wt_ref, win_ref, w_ref, o_ref, *, c: int, d: int):
    """One RB-row block: unpack -> gather -> slot-select -> GEMM."""
    rb = win_ref.shape[0]
    win = win_ref[...]                                   # (RB, 9) int32
    pos = win & WINDOW_POS_MASK
    sel = win >> 20
    g = jnp.take(wt_ref[...], pos.reshape(-1), axis=0)   # (RB*9, 3C)
    g = g.reshape(rb, 9, 3, c)
    dx_shift = 2 * jnp.arange(3, dtype=jnp.int32)
    slots = (sel[..., None] >> dx_shift) & 3             # (RB, 9, 3)
    onehot = (slots[..., None] == jnp.arange(3)).astype(g.dtype)
    taps = jnp.einsum("rpdw,rpwc->rpdc", onehot, g)      # (RB, 9, 3, C)
    out = jnp.dot(taps.reshape(rb, 27 * c), w_ref[...],
                  preferred_element_type=jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def window_conv_pallas(features: jnp.ndarray, win: jnp.ndarray,
                       weights: jnp.ndarray, block_rows: int = 400,
                       interpret: bool | None = None) -> jnp.ndarray:
    """Fused x-window sparse-conv layer.

    Args:
      features: (M, C) voxel features in linear-key order (padded last).
      win: (R, 9) packed int32 x-window maps (data/rulebook.py).
      weights: (27, C, D) tap weights in (dz, dy, dx) scan order.
    Returns:
      (R, D) float32 outputs (zeros at absent taps / padded queries).
    """
    m, c = features.shape
    r = win.shape[0]
    d = weights.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rb = min(block_rows, r)
    assert r % rb == 0, (r, rb)

    wt = shifted_window_table(features)                  # (M, 3C)
    w2 = weights.reshape(27 * c, d)

    return pl.pallas_call(
        functools.partial(_kernel, c=c, d=d),
        grid=(r // rb,),
        in_specs=[
            pl.BlockSpec((m, 3 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),       # resident table
            pl.BlockSpec((rb, 9), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27 * c, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(wt, win, w2)
