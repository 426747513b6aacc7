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


# ---------------------------------------------------------------------------
# Scalar-prefetch band kernel (VERDICT r4 item 4): no dynamic_gather at all.
#
# For a fixed window slot p = (dz, dy), neighbor keys are query_key + const,
# so pos[:, p] is MONOTONE in the key-sorted query order: a block of QB
# consecutive queries reads a contiguous BAND of table rows (measured spread
# <= 541 rows per 128-query block on clustered flagship rulebooks; the host
# validator below checks the <= BAND-1 contract per batch). The kernel:
#
#   grid (query_block i, slot p); per step:
#     1. DMA rows [start, start+BAND_P) of the zero-padded feature table
#        HBM -> VMEM at a *dynamic* offset start = start_ref[i, p] from the
#        scalar-prefetched base array (pltpu.PrefetchScalarGridSpec) —
#        contiguous stream at HBM bandwidth, not a row gather;
#     2. gather as THREE shifted ONE-HOT MXU MATMULS against the unshifted
#        band: oh_j[q, b] = (pos_adj[q]-start+j == b), g_j = oh_j @ band
#        (window rows pos-1, pos, pos+1) — rows whose position falls outside
#        the band produce an all-zero oh row (the absent-tap semantics);
#        shifting the one-hot, not the band, avoids Mosaic's unimplemented
#        sublane-offset concat relayout;
#     4. the existing slot-select (2-bit dx selectors) + one (QB, 3C) x
#        (3C, D) tap GEMM, accumulated into the resident output block.
#
# Everything Mosaic sees is VPU compares + MXU matmuls + async DMA — none of
# the broken dynamic_gather path.
# ---------------------------------------------------------------------------

_PAD_FRONT = 8          # zero rows prepended: window row pos-1 at pos=0


def _band_kernel(start_ref, has_ref, tab_ref, pos_ref, sel_ref, w_ref,
                 o_ref, fbuf, sem, *, c: int, d: int, band: int,
                 band_p: int, qb: int):
    i = pl.program_id(0)
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _init():
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)

    @pl.when(has_ref[i, p] == 1)
    def _work():
        start = start_ref[i, p]
        cp = pltpu.make_async_copy(tab_ref.at[pl.ds(start, band_p)], fbuf,
                                   sem)
        cp.start()
        cp.wait()
        f = fbuf[...]                                     # (BAND_P, C)
        b = pos_ref[0] - start                            # (QB, 1)
        # Three shifted ONE-HOTS against the unshifted band: g[j][q] =
        # f[b[q] + j] (window rows pos-1, pos, pos+1). Shifting the one-hot
        # instead of the band sidesteps Mosaic's unimplemented relayout for
        # concatenating sublane-offset slices (f[0:band], f[1:band+1], ...).
        iota = jax.lax.broadcasted_iota(jnp.int32, (qb, band_p), 1)
        gs = [jnp.dot((iota == (b + j)).astype(jnp.float32), f,
                      preferred_element_type=jnp.float32)  # (QB, C)
              for j in range(3)]
        sel = sel_ref[0]                                  # (QB, 1)
        taps = []
        for wdx in range(3):
            slot = (sel >> (2 * wdx)) & 3                 # (QB, 1) in {0..3}
            t = jnp.zeros((qb, c), jnp.float32)
            for j in range(3):
                t = t + gs[j] * (slot == j).astype(jnp.float32)
            taps.append(t)
        tapc = jnp.concatenate(taps, axis=1)              # (QB, 3C)
        wmat = w_ref[...].reshape(3 * c, d)
        o_ref[...] = o_ref[...] + jnp.dot(
            tapc, wmat, preferred_element_type=jnp.float32)


def _band_starts(pos_adj: jnp.ndarray, present: jnp.ndarray, rows: int,
                 qb: int, band: int, band_p: int):
    """(start, has, viol) per (query block, slot) from the window map.

    start is 8-row aligned (DMA efficiency) and clipped so the BAND_P fetch
    stays inside the padded table; has marks blocks with any present tap;
    viol counts present taps whose position falls outside [start,
    start+BAND) — the caller-side exactness check (0 under the rulebook
    builder's spread contract; violating taps contribute zero).
    """
    mp = pos_adj.shape[0]
    nb = mp // qb
    pb = pos_adj.reshape(nb, qb, 9)
    prb = present.reshape(nb, qb, 9)
    big = jnp.int32(2 ** 30)
    minpos = jnp.min(jnp.where(prb, pb, big), axis=1)          # (nb, 9)
    has = (minpos != big)
    start = jnp.clip((minpos // 8) * 8, 0, max(rows - band_p, 0))
    start = jnp.where(has, start, 0).astype(jnp.int32)
    local = pb - start[:, None, :]
    viol = jnp.sum(prb & ((local >= band) | (local < 0)))
    return start, has.astype(jnp.int32), viol


@functools.partial(jax.jit,
                   static_argnames=("band", "qb", "interpret", "check"))
def window_conv_band(features: jnp.ndarray, win: jnp.ndarray,
                     weights: jnp.ndarray, *, band: int = 640,
                     qb: int = 128, interpret: bool | None = None,
                     check: bool = False):
    """Fused x-window submanifold sparse-conv layer (scalar-prefetch bands).

    Args:
      features: (M, C) voxel features in linear-key order (padded last).
      win: (M, 9) packed int32 x-window maps (data/rulebook.py).
      weights: (27, C, D) tap weights in (dz, dy, dx) scan order.
      band: one-hot band width; present taps of any 128-query block must
        span < band rows (host contract, data/rulebook.py builder; see
        band_spread_ok). Multiple of 8.
      check: also return the violation count (device scalar).
    Returns:
      (M, D) float32 outputs — or (out, viol) with check=True.
    """
    m, c = features.shape
    r = win.shape[0]
    d = weights.shape[-1]
    assert r == m, ("fused x-window kernel is submanifold-only "
                    f"(output rows {r} != table rows {m})")
    assert band % 8 == 0 and qb % 8 == 0
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    band_p = band + _PAD_FRONT
    mp = -(-m // qb) * qb
    rows = max(m + 2 * _PAD_FRONT, band_p)
    rows = -(-rows // 8) * 8
    # The HBM table's lane dim is padded to the 128-lane tile so the band
    # DMA's memref_slice is tile-aligned (Mosaic requires it); Mosaic lays
    # the (rows, c<128) array out 128-lane-tiled anyway, so the pad adds no
    # physical HBM traffic beyond that layout.
    cp = max(-(-c // 128) * 128, 128)
    tab = jnp.zeros((rows, cp), features.dtype)
    tab = jax.lax.dynamic_update_slice(tab, features, (_PAD_FRONT, 0))

    absent = jnp.int32((3 | 3 << 2 | 3 << 4) << WINDOW_POS_BITS)
    winp = jnp.pad(win, ((0, mp - m), (0, 0)), constant_values=absent)
    pos = (winp & WINDOW_POS_MASK).astype(jnp.int32)
    sel = (winp >> WINDOW_POS_BITS).astype(jnp.int32)
    # padded-table position of window row pos-1 (the j=0 shifted-band row)
    pos_adj = pos + (_PAD_FRONT - 1)
    present = ((sel & 3) != 3) | (((sel >> 2) & 3) != 3) \
        | (((sel >> 4) & 3) != 3)

    start, has, viol = _band_starts(pos_adj, present, rows, qb, band, band_p)
    nb = mp // qb

    # Mosaic's block-shape rule wants the last two block dims (8,128)-aligned
    # OR equal to the array dims; a (qb, 1) block over the (mp, 9) maps is
    # illegal (1 != 9). Laying the maps out as (9, mp, 1) makes the per-step
    # block (1, qb, 1) legal: qb % 8 == 0 and the last dims match exactly.
    pos_t = pos_adj.T[:, :, None]
    sel_t = sel.T[:, :, None]
    # weights padded to the table's lane-padded width: the kernel then works
    # at cp throughout (zero channels contribute zero) and never lane-slices.
    wp = jnp.pad(weights.astype(jnp.float32), ((0, 0), (0, cp - c), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, 9),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # padded table
            pl.BlockSpec((1, qb, 1), lambda i, p, s, h: (p, i, 0)),  # pos
            pl.BlockSpec((1, qb, 1), lambda i, p, s, h: (p, i, 0)),  # sel
            pl.BlockSpec((3, cp, d), lambda i, p, s, h: (p, 0, 0)),
        ],
        out_specs=pl.BlockSpec((qb, d), lambda i, p, s, h: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((band_p, cp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_band_kernel, c=cp, d=d, band=band, band_p=band_p,
                          qb=qb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(start, has, tab.astype(jnp.float32), pos_t, sel_t, wp)
    out = out[:m]
    if check:
        return out, viol
    return out


def band_spread_ok(win, band: int = 640, qb: int = 128) -> bool:
    """Host-side check of window_conv_band's exactness contract (numpy).

    True iff every (128-query block, slot) pair's present taps span < band
    rows — the rulebook builder's key-sorted layout makes this hold with
    ~2x margin at flagship shapes (measured max 541); pathological frames
    should fall back to the XLA window_gather path.
    """
    import numpy as np
    w = np.asarray(win)
    if w.ndim == 3:
        return all(band_spread_ok(wi, band, qb) for wi in w)
    m = w.shape[0]
    mp = -(-m // qb) * qb
    absent = (3 | 3 << 2 | 3 << 4) << WINDOW_POS_BITS
    w = np.pad(w, ((0, mp - m), (0, 0)), constant_values=absent)
    pos = (w & WINDOW_POS_MASK).astype(np.int64)
    sel = w >> WINDOW_POS_BITS
    present = ((sel & 3) != 3) | (((sel >> 2) & 3) != 3) \
        | (((sel >> 4) & 3) != 3)
    pb = pos.reshape(-1, qb, 9)
    prb = present.reshape(-1, qb, 9)
    big = 2 ** 30
    mn = (np.min(np.where(prb, pb, big), axis=1) // 8) * 8   # aligned start
    mx = np.max(np.where(prb, pb, -1), axis=1)
    return bool(np.all((mx - mn) < band))


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
