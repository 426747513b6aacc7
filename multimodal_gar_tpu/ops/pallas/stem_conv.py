"""Pallas TPU kernel for the I3D stem convolution (7x7x7, stride 2).

XLA's native lowering of the space-to-depth'd stem — a (7,4,4)/stride-
(2,1,1) conv over 12 channels — is MXU lane-starved (contraction maps the
12 input channels onto 128 lanes) and measures ~24 ms at the flagship
working point; every XLA-level channel-folding rewrite tried (t2c, t-parity
fold) was slower (docs/ROUND2_NOTES.md). This kernel performs the conv as
an im2col GEMM with the patch matrix built in VMEM:

  - grid (B, T_out, H/TH, W/TW); per program one (TH*TW, 64) output tile;
  - the (7, TH+3, TW+3, 12) input window is DMA'd to VMEM once;
  - per temporal tap dt, a (TH*TW, 16*16) patch chunk is assembled from
    the 16 spatial shifts (each 12 channels padded to a 16-lane slot so
    writes stay lane-aligned) and contracted against the matching
    (256, 64) weight slice on the MXU — contraction 256 instead of 12.

Numerics: pure f32, bit-comparable to the XLA path up to dot-product
association order.

STATUS: logic-validated (interpret-mode parity vs lax.conv, tested in
tests/test_pallas.py) but NOT on the active path. Mosaic requires DMA
slices with tile-aligned trailing dims (verified empirically: (7, 11,
131, 12) windows fail to lower; (7, 16, 1664) flattened-lane windows
compile), so the production version needs the (T, H, W*C) flattened-lane
layout plus per-tap lane-shifted patch extraction — measured-cost unknown
and left for a future round. models/i3d.py keeps the XLA s2d stem
(~24 ms at flagship shapes) meanwhile.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLOT = 16        # lane-aligned per-tap channel slot (12 real + 4 zero)


def _stem_kernel(x_ref, w_ref, o_ref, xs, patch, acc, sem,
                 *, th: int, tw: int, kt: int, ks: int, cin: int):
    """One (th*tw, cout) output tile.

    x_ref: HBM (T_pad, H_pad, W_pad, cin); w_ref: VMEM (kt, ks*ks*_SLOT,
    cout); o_ref: VMEM block (1, th, tw, cout); xs: VMEM scratch
    (kt, th+ks-1, tw+ks-1, cin); patch: VMEM (th*tw, ks*ks*_SLOT);
    acc: VMEM (th*tw, cout).
    """
    bb = pl.program_id(0)
    t = pl.program_id(1)
    i = pl.program_id(2)
    j = pl.program_id(3)

    dma = pltpu.make_async_copy(
        x_ref.at[bb, pl.ds(2 * t, kt), pl.ds(i * th, th + ks - 1),
                 pl.ds(j * tw, tw + ks - 1), :],
        xs, sem)
    dma.start()
    dma.wait()

    # zero the patch once: the 4 pad lanes of each 16-lane slot are never
    # written and must not hold garbage (0 * NaN would poison the dot)
    patch[:] = jnp.zeros_like(patch)
    acc[:] = jnp.zeros_like(acc)
    for dt in range(kt):
        for di in range(ks):
            for dj in range(ks):
                s = di * ks + dj
                blk = xs[dt, di:di + th, dj:dj + tw, :]
                patch[:, pl.ds(s * _SLOT, cin)] = blk.reshape(th * tw, cin)
        acc[:] += jnp.dot(patch[:], w_ref[dt],
                          preferred_element_type=jnp.float32)
    o_ref[0, 0] = acc[:].reshape(th, tw, o_ref.shape[-1])


@functools.partial(jax.jit, static_argnames=("th", "tw"))
def stem_conv_pallas(xd: jnp.ndarray, w2: jnp.ndarray,
                     th: int = 8, tw: int = 128) -> jnp.ndarray:
    """s2d'd stem conv: xd (B, T, H', W', 12), w2 (7, 4, 4, 12, 64)
    -> (B, T_out, H'-3, W'-3, 64) with temporal stride 2, pad (3, 3).

    Matches jax.lax.conv_general_dilated(xd, w2, (2, 1, 1),
    [(3, 3), (0, 0), (0, 0)]) (models/i3d.py:_stem_conv_s2d tail).
    """
    b, t, hp, wp, cin = xd.shape
    kt, ks, _, _, cout = w2.shape
    ft = (kt - 1) // 2
    t_out = (t + 2 * ft - kt) // 2 + 1
    h_out = hp - (ks - 1)
    w_out = wp - (ks - 1)
    n_h = -(-h_out // th)
    n_w = -(-w_out // tw)

    # pad so tiles fit exactly (extra rows/cols computed then dropped)
    hp_pad = n_h * th + ks - 1
    wp_pad = n_w * tw + ks - 1
    xp = jnp.pad(xd, ((0, 0), (ft, ft), (0, hp_pad - hp),
                      (0, wp_pad - wp), (0, 0)))

    # weights: (kt, ks*ks*_SLOT, cout), each tap in a 16-lane slot
    wpad = jnp.pad(w2, ((0, 0), (0, 0), (0, 0), (0, _SLOT - cin), (0, 0)))
    wk = wpad.reshape(kt, ks * ks * _SLOT, cout)

    kernel = functools.partial(_stem_kernel, th=th, tw=tw, kt=kt, ks=ks,
                               cin=cin)
    out = pl.pallas_call(
        kernel,
        grid=(b, t_out, n_h, n_w),
        in_specs=[
            pl.BlockSpec((b, t + 2 * ft, hp_pad, wp_pad, cin),
                         lambda bb, tt, ii, jj: (0, 0, 0, 0, 0),
                         memory_space=pltpu.ANY),
            pl.BlockSpec((kt, ks * ks * _SLOT, cout),
                         lambda bb, tt, ii, jj: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, th, tw, cout),
            lambda bb, tt, ii, jj: (bb, tt, ii, jj, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_out, n_h * th, n_w * tw, cout),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kt, th + ks - 1, tw + ks - 1, cin), jnp.float32),
            pltpu.VMEM((th * tw, ks * ks * _SLOT), jnp.float32),
            pltpu.VMEM((th * tw, cout), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xp, wk)
    return out[:, :, :h_out, :w_out, :]
