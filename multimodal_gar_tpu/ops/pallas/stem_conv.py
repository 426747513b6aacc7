"""Pallas TPU kernel for the I3D stem convolution (7x7x7, stride 2).

XLA's native lowering of the space-to-depth'd stem — a (7,4,4)/stride-
(2,1,1) conv over 12 channels — is MXU lane-starved (contraction maps the
12 input channels onto 128 lanes) and measures ~21 ms at the flagship
working point (docs/ROUND2_NOTES.md); every XLA-level channel-folding
rewrite tried (t2c, t-parity fold) was slower. This kernel performs the
conv as an im2col GEMM with the patch matrix built in VMEM.

Round-2's first attempt was rejected by Mosaic: DMA windows with an
unaligned trailing dim — (7, 11, 131, 12) slices — fail to lower, while
lane-aligned windows compile (empirically bisected). This rewrite uses the
lane-friendly layout that bisection pointed to:

  - input is pre-transposed (XLA-side) to (B, T_pad, H_pad, C16, W_pad):
    channels on the SUBLANE axis (12 padded to 16), W on the LANE axis
    (padded to a 128 multiple), so every DMA window is
    (7, 11, 16, n+128) with 128-aligned lane starts;
  - per program (one (b, t_out, h-block-of-8, w-chunk)): the window is
    DMA'd once, then for each of 4 output ROW PAIRS a (K, n) patch is
    assembled from FOUR merged copies (one per dj lane-shift; the
    (kt, 5, 16, n) window slice merges its leading dims into sublanes
    layout-naturally — 140 per-slot copies measured pure overhead);
  - one logical GEMM per pair: (128, K) @ (K, n) where the 128 M-rows are
    [row r (x) 64 cout | row r+1 (x) 64 cout] — the weight matrix is
    extended over di in [0,5) with the second row's taps shifted one slot,
    so both M and N run at full MXU tile width (a lone 64-channel output
    would idle half the systolic array);
  - the f32 x f32 product runs as a MANUAL 3-pass bf16 split
    (hi/lo error-compensated: a_hi p_hi + a_hi p_lo + a_lo p_hi, f32
    accumulation). Mosaic's f32 dot is a 6-pass emulation and rejects
    Precision.HIGH; the explicit split halves MXU time. Designed/interpret
    accuracy is ~1e-5 relative, but measured on hardware (v5e, 2026-08-18)
    the kernel lands at 1.62e-3 — 1xbf16-class, i.e. this image's Mosaic
    is not preserving the compensation products' contribution (XLA HIGH on
    the same chip reaches 1.3e-5). Same class as XLA DEFAULT precision
    (2.2e-3), so the eval path remains within bf16 tolerance; revisit when
    the toolchain updates (tools/bench_stem.py prints the parity table);
  - optional fused affine+ReLU epilogue (folded inference BatchNorm).

K = 4 * 7 * 5 * 16 = 2240, dj-major (vs 1344 real taps: x1.25 from the
di-pair extension, x1.33 from the 12->16 channel slot padding).

Round-5 elimination (on-chip A/Bs, docs/ROUND5_NOTES.md): the kernel runs
~48 us/program vs 7.4 us of GEMM, and neither the patch copies (di-major
variant, 45% less copy traffic: wash) nor the output transposes (cmajor
variant: -2%) account for the gap. The remaining structural suspect is the
per-program window DMA, which this kernel issues and awaits synchronously
— Pallas's automatic double-buffering only applies to block-spec'd inputs,
and the stem's windows overlap (stride-2 temporal, 3-row H halo), which a
single BlockSpec cannot express. ``_stem_kernel_aliased`` (``pipelined``)
implements the fix: it passes the SAME input array through EIGHT aliased
BlockSpecs — 4 temporal slots of block t=2 at offsets 2*tt+{0,2,4,6} x 2 H
slots of block h=8 at offsets 8*hh+{0,8} — so every (7, 11)-window row
lives in one of the aliased blocks and the grid machinery prefetches
program i+1's windows during program i's compute. The kernel merges the 8
blocks into the same contiguous (7, 11, 16, W) VMEM window the manual-DMA
kernel fetched (+1.85 MB/program of VPU copy — measured immaterial by the
di-major A/B) and the rest of the program is identical.

Matches the Unit3D stem semantics of reference model/backbone.py:134-206
(after models/i3d.py's exact space-to-depth rewrite of the 7^3 stem).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CSLOT = 16       # sublane-aligned channel slot (12 real + 4 zero)
_HBLK = 8         # output rows per program
_NMAX = 640       # max output columns per w-chunk (5 lane tiles)


def _stem_kernel(xh_ref, xl_ref, ah_ref, al_ref, sc_ref, bi_ref, o_ref,
                 xs_h, xs_l, p_h, p_l, sem, *,
                 kt: int, ks: int, n: int, ws: int, fuse: bool, cout: int,
                 passes: int = 3, cmajor: bool = False):
    """One (8 rows, n cols, cout) output block.

    xh/xl_ref: HBM (B, T_pad, H_pad, 16, W_pad) bf16 hi/lo halves;
    ah/al_ref: VMEM (2*cout, K) bf16 weight halves; sc/bi_ref: VMEM
    (2*cout, 128) f32 folded affine (col 0 used, scale/bias duplicated over
    the row-pair halves); o_ref: VMEM block (1, 1, 8, n, cout) f32;
    xs_h/xs_l: VMEM (kt, 11, 16, n+128) bf16 — exactly the 8 + ks - 1 H
    rows the block reads (H is not a tiled dim, so no sublane rounding; a
    16-row window measured a VMEM OOM at n=640); p_h/p_l: VMEM (K, n) bf16.
    """
    bb = pl.program_id(0)
    tt = pl.program_id(1)
    hh = pl.program_id(2)

    hwin = _HBLK + ks - 1
    dma_h = pltpu.make_async_copy(
        xh_ref.at[bb, pl.ds(2 * tt, kt), pl.ds(hh * _HBLK, hwin), :,
                  pl.ds(ws, n + 128)], xs_h, sem.at[0])
    dma_h.start()
    if passes >= 2:
        dma_l = pltpu.make_async_copy(
            xl_ref.at[bb, pl.ds(2 * tt, kt), pl.ds(hh * _HBLK, hwin), :,
                      pl.ds(ws, n + 128)], xs_l, sem.at[1])
        dma_l.start()
        dma_h.wait()
        dma_l.wait()
    else:
        dma_h.wait()

    ndi = ks + 1
    blk = kt * ndi * _CSLOT
    for p in range(_HBLK // 2):
        r = 2 * p
        for dj in range(ks):
            rows = pl.ds(dj * blk, blk)
            p_h[rows, :] = xs_h[:, r:r + ndi, :, dj:dj + n].reshape(blk, n)
            if passes >= 2:
                p_l[rows, :] = xs_l[:, r:r + ndi, :, dj:dj + n].reshape(blk, n)
        res = jnp.dot(ah_ref[:], p_h[:], preferred_element_type=jnp.float32)
        if passes >= 2:
            res += jnp.dot(ah_ref[:], p_l[:],
                           preferred_element_type=jnp.float32)
        if passes >= 3:
            res += jnp.dot(al_ref[:], p_h[:],
                           preferred_element_type=jnp.float32)
        if fuse:
            # folded BN + ReLU on the GEMM layout (row-broadcast, cheap;
            # doing this after the transpose measured +3.6 ms)
            res = jnp.maximum(res * sc_ref[:, 0:1] + bi_ref[:, 0:1], 0.0)
        if cmajor:
            # cout-major output: (128, n) -> (2, cout, n) is a pure sublane
            # split (no relayout); the (B,T,H,C,W)->(B,T,H,W,C) transpose
            # happens once, XLA-side, at HBM bandwidth — vs 8 in-kernel
            # (cout, n) VPU relayouts per program here.
            o_ref[0, 0, pl.ds(r, 2)] = res.reshape(2, cout, n)
        else:
            o_ref[0, 0, r] = res[:cout].T                   # (n, cout)
            o_ref[0, 0, r + 1] = res[cout:].T


def _stem_kernel_dimajor(xh_ref, xl_ref, ah_ref, al_ref, sc_ref, bi_ref,
                         o_ref, xs_h, xs_l, p_h, p_l, sem, *,
                         kt: int, ks: int, n: int, ws: int, fuse: bool,
                         cout: int, passes: int = 3):
    """di-major variant of ``_stem_kernel`` (round-5 stem iteration).

    The original kernel assembles a fresh (K, n) patch for EVERY (row pair,
    dj) — 16 sublane-merge + lane-shift copies per program, ~11.5 MB of VMEM
    copy traffic that measures ~3x the GEMM time (roofline table,
    docs/ROUND5_NOTES.md). This variant stores the DMA'd window H-major —
    HBM layout (B, H_pad, T_pad, C16, W_pad), so the whole (hwin, kt, 16, n)
    window merges into patch rows ordered (di, dt, c) — and builds ONE
    lane-shifted patch per dj (4 copies, 6.3 MB). Each row pair's operand is
    then a CONTIGUOUS 560-row sublane slice of the dj patch (rows
    di in [r, r+5) x (dt, c)), so the GEMM runs as 4 accumulated K=560 dots
    against per-dj weight blocks — identical FLOPs, 4x fewer relayout ops,
    ~45% less copy traffic.

    xh/xl_ref: HBM (B, H_pad, T_pad, 16, W_pad) bf16 hi/lo halves;
    ah/al_ref: VMEM (ks*2*cout, (ks+1)*kt*16) per-dj weight blocks
    (_build_a_dimajor); p_h/p_l: VMEM (ks*hwin*kt*16, n) — dj-blocked merged
    windows. Everything else as ``_stem_kernel``.
    """
    bb = pl.program_id(0)
    tt = pl.program_id(1)
    hh = pl.program_id(2)

    hwin = _HBLK + ks - 1
    dma_h = pltpu.make_async_copy(
        xh_ref.at[bb, pl.ds(hh * _HBLK, hwin), pl.ds(2 * tt, kt), :,
                  pl.ds(ws, n + 128)], xs_h, sem.at[0])
    dma_h.start()
    if passes >= 2:
        dma_l = pltpu.make_async_copy(
            xl_ref.at[bb, pl.ds(hh * _HBLK, hwin), pl.ds(2 * tt, kt), :,
                      pl.ds(ws, n + 128)], xs_l, sem.at[1])
        dma_l.start()
        dma_h.wait()
        dma_l.wait()
    else:
        dma_h.wait()

    rowblk = kt * _CSLOT                  # (dt, c) rows per di slot: 112
    wrows = hwin * rowblk                 # rows per dj window: 1232
    ndi = ks + 1
    for dj in range(ks):
        p_h[pl.ds(dj * wrows, wrows), :] = \
            xs_h[:, :, :, dj:dj + n].reshape(wrows, n)
        if passes >= 2:
            p_l[pl.ds(dj * wrows, wrows), :] = \
                xs_l[:, :, :, dj:dj + n].reshape(wrows, n)
    for pr in range(_HBLK // 2):
        r = 2 * pr
        res = None
        for dj in range(ks):
            rows = pl.ds(dj * wrows + r * rowblk, ndi * rowblk)
            arows = pl.ds(dj * 2 * cout, 2 * cout)
            d = jnp.dot(ah_ref[arows, :], p_h[rows, :],
                        preferred_element_type=jnp.float32)
            if passes >= 2:
                d += jnp.dot(ah_ref[arows, :], p_l[rows, :],
                             preferred_element_type=jnp.float32)
            if passes >= 3:
                d += jnp.dot(al_ref[arows, :], p_h[rows, :],
                             preferred_element_type=jnp.float32)
            res = d if res is None else res + d
        if fuse:
            res = jnp.maximum(res * sc_ref[:, 0:1] + bi_ref[:, 0:1], 0.0)
        o_ref[0, 0, r] = res[:cout].T                       # (n, cout)
        o_ref[0, 0, r + 1] = res[cout:].T


def _stem_kernel_aliased(x00, x01, x10, x11, x20, x21, x30, x31,
                         ah_ref, sc_ref, bi_ref, o_ref, xs, p_h, *,
                         kt: int, ks: int, n: int, fuse: bool, cout: int):
    """Pipelined variant of ``_stem_kernel`` (round-5 stem iteration #3).

    No manual DMA: the input arrives through 8 ALIASED block-spec'd views
    of the same (B, T_pad, H_pad, 16, W_pad) array — temporal slot
    a in [0, 4) is a (1, 2, 8, 16, W_pad) block at block index
    (bb, tt + a, hh + b, 0, 0), i.e. element rows 2*tt + 2a + {0, 1} /
    8*hh + 8b + {0..7} — so Pallas's grid pipeline prefetches program
    i+1's window during program i's compute (the manual-DMA kernels issue
    and await their window fetch synchronously inside the program; the
    roofline table pins ~40 of the 48 us/program on that serialization).
    The kernel first merges the aliased blocks into the same contiguous
    (kt, 11, 16, W_pad) VMEM window ``_stem_kernel`` DMA'd (8 copies,
    1.85 MB — the di-major A/B measured patch-copy traffic immaterial),
    then assembly/GEMM/epilogue are identical to ``_stem_kernel``.

    Constraints (checked by the caller, which falls back to the manual-DMA
    kernel): kt == 7, ks == 4, single w-chunk (the blocks span the full
    padded W), passes == 1 (bf16 hi half only — the model default).
    """
    hwin = _HBLK + ks - 1
    slots = (x00, x01, x10, x11, x20, x21, x30, x31)
    for a in range(4):
        ta = min(2, kt - 2 * a)
        for b_ in range(2):
            hb = min(_HBLK, hwin - _HBLK * b_)
            ref = slots[a * 2 + b_]
            xs[2 * a:2 * a + ta, _HBLK * b_:_HBLK * b_ + hb] = ref[0, :ta, :hb]

    ndi = ks + 1
    blk = kt * ndi * _CSLOT
    for p in range(_HBLK // 2):
        r = 2 * p
        for dj in range(ks):
            rows = pl.ds(dj * blk, blk)
            p_h[rows, :] = xs[:, r:r + ndi, :, dj:dj + n].reshape(blk, n)
        res = jnp.dot(ah_ref[:], p_h[:], preferred_element_type=jnp.float32)
        if fuse:
            res = jnp.maximum(res * sc_ref[:, 0:1] + bi_ref[:, 0:1], 0.0)
        o_ref[0, 0, r] = res[:cout].T                       # (n, cout)
        o_ref[0, 0, r + 1] = res[cout:].T


def _build_a_dimajor(w2: jnp.ndarray) -> jnp.ndarray:
    """(kt, ks, ks, cin, cout) stem weights -> (ks*2*cout, (ks+1)*kt*16)
    per-dj GEMM blocks in the di-major kernel's K order (di, dt, c16):
    block dj's rows [0, cout) carry its taps at di slots [0, ks) (output
    row r), rows [cout, 2*cout) the same taps at slots [1, ks+1)."""
    kt, ks, _, cin, cout = w2.shape
    wo = jnp.transpose(w2, (2, 4, 1, 0, 3))        # (dj, cout, di, kt, cin)
    a = jnp.zeros((ks, 2 * cout, ks + 1, kt, _CSLOT), w2.dtype)
    a = a.at[:, :cout, :ks, :, :cin].set(wo)
    a = a.at[:, cout:, 1:, :, :cin].set(wo)
    return a.reshape(ks * 2 * cout, (ks + 1) * kt * _CSLOT)


def _build_a(w2: jnp.ndarray) -> jnp.ndarray:
    """(kt, ks, ks, cin, cout) stem weights -> the (2*cout, K) pair GEMM
    matrix in the kernel's dj-major K order (dj, dt, di5, c16): rows
    [0, cout) carry taps at di slots [0, ks) (output row r), rows
    [cout, 2*cout) the same taps at slots [1, ks+1) (row r+1)."""
    kt, ks, _, cin, cout = w2.shape
    wo = jnp.transpose(w2, (4, 2, 0, 1, 3))        # (cout, dj, kt, di, cin)
    a = jnp.zeros((2 * cout, ks, kt, ks + 1, _CSLOT), w2.dtype)
    a = a.at[:cout, :, :, :ks, :cin].set(wo)
    a = a.at[cout:, :, :, 1:, :cin].set(wo)
    return a.reshape(2 * cout, ks * kt * (ks + 1) * _CSLOT)


def _split_hi_lo(x: jnp.ndarray):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit,
                   static_argnames=("fuse_affine", "interpret", "passes",
                                    "dimajor", "cmajor", "pipelined"))
def _stem_conv_impl(xd: jnp.ndarray, w2: jnp.ndarray,
                    scale: Optional[jnp.ndarray],
                    bias: Optional[jnp.ndarray],
                    fuse_affine: bool = False,
                    interpret: bool = False,
                    passes: int = 3,
                    dimajor: bool = False,
                    cmajor: bool = False,
                    pipelined: bool = False) -> jnp.ndarray:
    b, t, hp, wp, cin = xd.shape
    kt, ks, _, _, cout = w2.shape
    assert cin <= _CSLOT and cout * 2 == 128, (cin, cout)
    ft = (kt - 1) // 2
    t_out = (t + 2 * ft - kt) // 2 + 1
    h_out = hp - (ks - 1)
    w_out = wp - (ks - 1)
    n_hb = -(-h_out // _HBLK)
    h_pad = n_hb * _HBLK + _HBLK

    # w chunks: each n_j <= _NMAX and 128-aligned; the last chunk is narrow
    # rather than padding every chunk to a common width (MXU N-waste).
    w_align = _round_up(w_out, 128)
    n_w = -(-w_align // _NMAX)
    chunk_ns = []
    rem = w_align
    for _ in range(n_w):
        chunk_ns.append(min(_NMAX, rem))
        rem -= chunk_ns[-1]
    w_pad = w_align + 128                          # last window in bounds

    # pipelined (aliased-BlockSpec) kernel: flagship-geometry + 1-pass +
    # single-w-chunk only; anything else falls back to the manual-DMA path.
    pipelined = (pipelined and not dimajor and not cmajor and passes == 1
                 and kt == 7 and ks == 4 and n_w == 1)

    # (B, T, H, W, C) -> (B, T_pad, H_pad, C16, W_pad) — or H-major
    # (B, H_pad, T_pad, C16, W_pad) for the di-major kernel — bf16 halves
    if dimajor:
        x5 = jnp.transpose(xd, (0, 2, 1, 4, 3))
    else:
        x5 = jnp.transpose(xd, (0, 1, 2, 4, 3))
    # the aliased T blocks read element rows up to 2*(t_out-1) + 8; extend
    # the back pad past (ft, ft) by the (zero, never-computed-on) remainder
    tb = ft + max(0, 2 * t_out + 6 - t - 2 * ft) if pipelined else ft
    if dimajor:
        x5 = jnp.pad(x5, ((0, 0), (0, h_pad - hp), (ft, ft),
                          (0, _CSLOT - cin), (0, w_pad - wp)))
    else:
        x5 = jnp.pad(x5, ((0, 0), (ft, tb), (0, h_pad - hp),
                          (0, _CSLOT - cin), (0, w_pad - wp)))
    if passes >= 2:
        x_hi, x_lo = _split_hi_lo(x5)
    else:
        # 1-pass: no input-lo correction — skip materializing (and DMAing)
        # the lo half entirely; the kernel never reads xs_l/p_l.
        x_hi = x5.astype(jnp.bfloat16)
        x_lo = x_hi

    a_mat = _build_a_dimajor(w2) if dimajor else _build_a(w2)
    a_hi, a_lo = _split_hi_lo(a_mat)
    k_dim = a_mat.shape[1]
    a_rows = a_mat.shape[0]                        # 2*cout | ks*2*cout
    if fuse_affine:
        sc2 = jnp.tile(scale, 2)[:, None] * jnp.ones((1, 128), jnp.float32)
        bi2 = jnp.tile(bias, 2)[:, None] * jnp.ones((1, 128), jnp.float32)
    else:
        sc2 = jnp.zeros((2 * cout, 128), jnp.float32)
        bi2 = jnp.zeros((2 * cout, 128), jnp.float32)

    hwin = _HBLK + ks - 1
    xs_shape = ((hwin, kt, _CSLOT) if dimajor else (kt, hwin, _CSLOT))
    p_rows = ks * hwin * kt * _CSLOT if dimajor else k_dim
    chunks = []
    ws = 0
    if pipelined:
        n_chunk = chunk_ns[0]
        kernel = functools.partial(
            _stem_kernel_aliased, kt=kt, ks=ks, n=n_chunk,
            fuse=fuse_affine, cout=cout)
        w_blk = n_chunk + 128                      # == the full padded W
        x_specs = [
            pl.BlockSpec((1, 2, _HBLK, _CSLOT, w_blk),
                         lambda bb, tt, hh, a=a, b_=b_: (bb, tt + a,
                                                         hh + b_, 0, 0),
                         memory_space=pltpu.VMEM)
            for a in range(4) for b_ in range(2)
        ]
        vec_spec = pl.BlockSpec((a_rows, k_dim), lambda bb, tt, hh: (0, 0),
                                memory_space=pltpu.VMEM)
        aff_spec = pl.BlockSpec((2 * cout, 128), lambda bb, tt, hh: (0, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(b, t_out, n_hb),
            in_specs=x_specs + [vec_spec, aff_spec, aff_spec],
            out_specs=pl.BlockSpec(
                (1, 1, _HBLK, n_chunk, cout),
                lambda bb, tt, hh: (bb, tt, hh, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (b, t_out, n_hb * _HBLK, n_chunk, cout), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((kt, hwin, _CSLOT, w_blk), jnp.bfloat16),
                pltpu.VMEM((p_rows, n_chunk), jnp.bfloat16),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*([x_hi] * 8), a_hi, sc2, bi2)
        return out[:, :, :h_out, :w_out, :]
    for n_chunk in chunk_ns:
        if dimajor:
            kernel = functools.partial(
                _stem_kernel_dimajor, kt=kt, ks=ks, n=n_chunk, ws=ws,
                fuse=fuse_affine, cout=cout, passes=passes)
        else:
            kernel = functools.partial(
                _stem_kernel, kt=kt, ks=ks, n=n_chunk, ws=ws,
                fuse=fuse_affine, cout=cout, passes=passes, cmajor=cmajor)
        vec_spec = pl.BlockSpec((a_rows, k_dim),
                                lambda bb, tt, hh: (0, 0),
                                memory_space=pltpu.VMEM)
        aff_spec = pl.BlockSpec((2 * cout, 128), lambda bb, tt, hh: (0, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(b, t_out, n_hb),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                vec_spec, vec_spec, aff_spec, aff_spec,
            ],
            out_specs=pl.BlockSpec(
                (1, 1, _HBLK, cout, n_chunk) if cmajor
                else (1, 1, _HBLK, n_chunk, cout),
                lambda bb, tt, hh: (bb, tt, hh, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (b, t_out, n_hb * _HBLK, cout, n_chunk) if cmajor
                else (b, t_out, n_hb * _HBLK, n_chunk, cout), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM(xs_shape + (n_chunk + 128,), jnp.bfloat16),
                pltpu.VMEM(xs_shape + (n_chunk + 128,), jnp.bfloat16),
                pltpu.VMEM((p_rows, n_chunk), jnp.bfloat16),
                pltpu.VMEM((p_rows, n_chunk), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            # scratch + double-buffered blocks total ~24 MB; the default
            # scoped-vmem budget (16 MB on this toolchain) rejects it, so
            # raise the per-kernel limit (v5e VMEM is 128 MB).
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(x_hi, x_lo, a_hi, a_lo, sc2, bi2)
        chunks.append(out)
        ws += n_chunk
    if cmajor:
        full = chunks[0] if n_w == 1 else jnp.concatenate(chunks, axis=4)
        return jnp.transpose(full[:, :, :h_out, :, :w_out], (0, 1, 2, 4, 3))
    full = chunks[0] if n_w == 1 else jnp.concatenate(chunks, axis=3)
    return full[:, :, :h_out, :w_out, :]


def stem_conv_pallas(xd: jnp.ndarray, w2: jnp.ndarray,
                     scale: Optional[jnp.ndarray] = None,
                     bias: Optional[jnp.ndarray] = None,
                     interpret: bool = False,
                     passes: int = 3,
                     dimajor: bool = False,
                     cmajor: bool = False,
                     pipelined: bool = False) -> jnp.ndarray:
    """s2d'd stem conv: xd (B, T, H', W', 12), w2 (7, 4, 4, 12, 64)
    -> (B, T_out, H'-3, W'-3, 64), temporal stride 2 / pad (3, 3).

    Matches jax.lax.conv_general_dilated(xd, w2, (2, 1, 1),
    [(3, 3), (0, 0), (0, 0)]) (models/i3d.py:_stem_conv_s2d tail) to ~1e-5
    relative error in interpret mode (1.6e-3 measured on this image's
    Mosaic — see module docstring); when
    ``scale``/``bias`` are given the folded inference BatchNorm + ReLU
    epilogue runs inside the kernel (relu(conv * scale + bias)).

    ``passes`` selects the bf16 product split: 3 = the designed
    error-compensated a_hi@p_hi + a_hi@p_lo + a_lo@p_hi; 2 drops the
    weight-lo term; 1 is plain bf16 (a_hi@p_hi only — also skips the lo
    DMA and patch copies, ~halving non-MXU kernel work). On this image's
    Mosaic the 3-pass measures 1.6e-3 anyway (compensation dropped), so
    1-pass trades ~nothing: A/B in tools/bench_stem.py.

    ``dimajor`` selects the round-5 kernel variant (_stem_kernel_dimajor):
    one lane-shifted patch per dj instead of one per (row pair, dj) —
    identical sums, ~45% less VMEM copy traffic. Measured a wash on
    hardware (17.0/17.7 vs 17.3 ms, 2026-08-20) — the kernel is not
    patch-copy-bound.

    ``cmajor`` (dj-major kernel only) writes the output cout-major —
    ``res.reshape(2, cout, n)``, a pure sublane split — instead of the 8
    per-program (cout, n) VPU transposes, and pays one XLA-side
    (B,T,H,C,W)->(B,T,H,W,C) transpose at HBM bandwidth.

    ``pipelined`` selects the aliased-BlockSpec kernel
    (_stem_kernel_aliased): no manual DMA — the window arrives through 8
    aliased block-spec'd views so the Pallas grid pipeline prefetches the
    next program's window during this one's compute. Requires passes=1,
    kt=7/ks=4 geometry and a single w-chunk (w_out <= 640 post-align);
    falls back to the manual-DMA kernel otherwise.
    """
    fuse = scale is not None
    return _stem_conv_impl(xd, w2, scale, bias, fuse_affine=fuse,
                           interpret=interpret, passes=passes,
                           dimajor=dimajor, cmajor=cmajor,
                           pipelined=pipelined)
