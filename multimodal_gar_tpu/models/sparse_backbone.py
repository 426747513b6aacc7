"""Sparse 3D convolution backbone (VoxelBackBone8x), TPU-native.

Capability parity with reference pcdet/models/backbones_3d/spconv_backbone.py:69-181
(spconv SubMConv3d / SparseConv3d stacks emitting multi-scale features at
strides 1/2/4/8), rebuilt without spconv: XLA has no sparse-conv primitive, so
every layer is expressed as gather -> batched GEMM -> accumulate over the K^3
kernel taps (the "gather-GEMM-scatter" scheme, SURVEY.md §7.2.5b(i)):

  * active voxels live in fixed-size padded arrays (B, M, C) + (B, M, 3) zyx
    coords + (B, M) masks — static shapes for XLA;
  * neighbor resolution uses sorted-linear-key binary search (ops/voxel.py)
    instead of spconv's hash rulebook or a dense 640 MB index grid;
  * submanifold layers keep the active set; strided layers derive the
    downsampled active set with jnp.unique(size=...) (fixed output cap);
  * all matmuls are (M, Cin) x (Cin, Cout) GEMMs batched over the 27 taps —
    MXU-friendly — and BatchNorm is computed under the voxel validity mask.

Weight layout: (K^3, Cin, Cout), tap order = ops.voxel.kernel_offsets scan
order (z outer, x inner), correlation orientation (out[p] += W[off] @ in[p+off]).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from ..ops import voxel as vox
from .layers import MaskedBatchNorm


@flax.struct.dataclass
class SparseTensor:
    """Padded batch of sparse voxel sets."""
    features: jnp.ndarray                         # (B, M, C)
    coords: jnp.ndarray                           # (B, M, 3) int32 zyx
    valid: jnp.ndarray                            # (B, M) bool
    spatial_shape: Tuple[int, int, int] = flax.struct.field(pytree_node=False)


from ..ops.voxel import (WINDOW_POS_BITS, WINDOW_POS_MASK,
                         shifted_window_table)


def window_gather(features: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Gather all 27 tap features from a key-sorted stage via x-window maps.

    XLA's TPU row gather costs ~5-6 cycles per row regardless of row width
    (measured: a (221k, 32)-row gather runs at 37x its HBM-bandwidth bound),
    so this gathers 9 rows per query from a 3C-wide shifted table — rows
    [j-1, j, j+1] of the sorted feature array hold every possible dx in
    {-1, 0, +1} neighbor (consecutive linear keys are adjacent rows) — and
    resolves which window slot holds which dx tap from the host-packed
    selectors (data/rulebook.py: j | slots << 20). 3x fewer gather rows for
    ~1.07x the bytes.

    Args:
      features: (M, C), rows in linear-key order (padded rows last).
      win: (R, 9) packed int32 window map for this layer.
    Returns:
      (R, 27, C) tap features in (dz, dy, dx) scan order, zeros where the
      neighbor is absent/out of range.
    """
    m, c = features.shape
    r = win.shape[0]
    wt = shifted_window_table(features)                  # (M, 3C)
    pos = win & WINDOW_POS_MASK
    sel = win >> WINDOW_POS_BITS                   # packed values < 2^26 > 0
    g = wt[pos].reshape(r, 9, 3, c)                      # the 9R-row gather
    dx_shift = 2 * jnp.arange(3, dtype=win.dtype)
    slots = (sel[..., None] >> dx_shift) & 3             # (R, 9, 3dx)
    onehot = (slots[..., None]
              == jnp.arange(3, dtype=win.dtype)).astype(features.dtype)
    taps = jnp.einsum("rpdw,rpwc->rpdc", onehot, g)      # slot -> dx select
    return taps.reshape(r, 27, c)


def batched_window_gather(features: jnp.ndarray,
                          win: jnp.ndarray) -> jnp.ndarray:
    """window_gather over a batch, unrolled in Python instead of vmapped.

    vmap turns the (R, 9)-row gather into ONE batched gather with a batch
    dimension — measured super-linear on TPU (the sparse backbone's per-clip
    cost inflates 35.7 -> 46.1 ms from b1 to b4, ROUND5_NOTES batch-scaling
    table); B separate gathers keep each item on the same fast path the b1
    program uses. B is static and small (<=8), so the unroll is cheap to
    trace and XLA schedules the copies independently.
    """
    if features.shape[0] == 1:
        return window_gather(features[0], win[0])[None]
    return jnp.stack([window_gather(features[b], win[b])
                      for b in range(features.shape[0])])


def _neighbor_idx_subm(coords, valid, spatial_shape, kernel_size):
    """(B, M, K^3) row indices of each voxel's neighbors (-1 if absent)."""
    offs = vox.kernel_offsets(kernel_size)                       # (K3, 3)

    def per_item(c, v):
        table = vox.build_lookup(c, v, spatial_shape)
        nbr = c[:, None, :] + offs[None, :, :]                   # (M, K3, 3)
        nv = jnp.broadcast_to(v[:, None], nbr.shape[:2])
        return vox.lookup(table, nbr, nv, spatial_shape)

    return jax.vmap(per_item)(coords, valid)


class SubMConv3d(nn.Module):
    """Submanifold sparse conv: active set unchanged, neighbors gathered.

    Matches spconv.SubMConv3d(kernel=3, stride=1) semantics (reference
    spconv_backbone.py:12): output only at input-active sites.
    """
    out_channels: int
    kernel_size: int = 3
    use_bias: bool = False
    dtype: Any = jnp.float32
    # fuse the x-window gather + tap GEMM into one Pallas kernel
    # (ops/pallas/window_conv.py). Eval-path f32 submanifold layers only;
    # selected via LiDARBackboneConfig.x_window_fused.
    fused_window: bool = False
    # fuse only layers with cin >= this: the band kernel DMAs the feature
    # table at 128 lanes regardless of C, so narrow layers (the cin=4/16
    # stage-1 convs) waste 8-32x DMA bytes and measure a wash vs the XLA
    # x-window path, while cin>=32 layers win 1.1-4.8x (ROUND5_NOTES band
    # kernel A/B).
    fused_min_cin: int = 32

    @nn.compact
    def __call__(self, st: SparseTensor,
                 neighbor_idx: jnp.ndarray | None = None,
                 window: jnp.ndarray | None = None) -> SparseTensor:
        k3 = self.kernel_size ** 3
        cin = st.features.shape[-1]
        w = self.param("kernel", nn.initializers.kaiming_normal(),
                       (k3, cin, self.out_channels))
        if window is not None:
            assert self.kernel_size == 3
            fuse = (self.fused_window and self.dtype == jnp.float32
                    and window.shape[1] == st.features.shape[1]
                    and cin >= self.fused_min_cin)
            if fuse:
                # scalar-prefetch band kernel (ops/pallas/window_conv.py):
                # contiguous band DMA + one-hot MXU gather — compiles on
                # Mosaic toolchains whose dynamic_gather cannot. Python
                # unroll over the (small, static) batch: vmap of a
                # scalar-prefetch pallas_call is not supported.
                from ..ops.pallas.window_conv import window_conv_band
                wf = w.astype(jnp.float32)
                out = jnp.stack([
                    window_conv_band(st.features[b].astype(jnp.float32),
                                     window[b], wf)
                    for b in range(st.features.shape[0])])
                if self.use_bias:
                    out = out + self.param("bias", nn.initializers.zeros,
                                           (self.out_channels,))
                out = out * st.valid[..., None].astype(out.dtype)
                return st.replace(features=out)
            gathered = batched_window_gather(st.features, window)
        else:
            if neighbor_idx is None:
                neighbor_idx = _neighbor_idx_subm(
                    st.coords, st.valid, st.spatial_shape, self.kernel_size)

            idx = jnp.clip(neighbor_idx, 0)                      # (B, M, K3)
            hit = (neighbor_idx >= 0)[..., None].astype(st.features.dtype)
            gathered = jax.vmap(lambda f, i: f[i])(st.features, idx)
            gathered = gathered * hit                            # (B,M,K3,Cin)
        out = jnp.einsum("bmkc,kcd->bmd", gathered.astype(self.dtype),
                         w.astype(self.dtype))
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.out_channels,))
        out = out * st.valid[..., None].astype(out.dtype)
        return st.replace(features=out)


def _downsample_shape(shape, kernel_size, stride, padding):
    return tuple(
        (d + 2 * p - k) // s + 1
        for d, k, s, p in zip(shape, _tup3(kernel_size), _tup3(stride),
                              _tup3(padding)))


def _tup3(v):
    return (v, v, v) if isinstance(v, int) else tuple(v)


def _kernel_offsets_aniso(kernel_size):
    """(prod(K), 3) zyx tap offsets for a possibly-anisotropic kernel."""
    kz, ky, kx = _tup3(kernel_size)
    zz, yy, xx = jnp.meshgrid(jnp.arange(kz), jnp.arange(ky), jnp.arange(kx),
                              indexing="ij")
    return jnp.stack([zz.ravel(), yy.ravel(), xx.ravel()], -1).astype(jnp.int32)


def _downsample_active_set(coords, valid, in_shape, out_shape, kernel_size,
                           stride, padding, max_out):
    """Derive the strided-conv output active set (coords, valid) per item.

    spconv.SparseConv3d semantics: output site o is active iff some input site
    i = o*stride - pad + k (k in [0, K)^3) is active. From each input voxel we
    emit all candidate outputs o = (i + pad - k) / stride (where divisible),
    then dedupe with a fixed-size unique.
    """
    s = jnp.asarray(_tup3(stride), jnp.int32)
    p = jnp.asarray(_tup3(padding), jnp.int32)
    koffs = _kernel_offsets_aniso(kernel_size)

    def per_item(c, v):
        num = c[:, None, :] + p[None, None, :] - koffs[None, :, :]   # (M, K3, 3)
        o = num // s
        exact = (o * s == num).all(axis=-1)                          # divisibility
        ov = v[:, None] & exact
        keys = vox.linear_keys(o.reshape(-1, 3), ov.reshape(-1), out_shape)
        uniq = jnp.unique(keys, size=max_out, fill_value=vox.INVALID_KEY)
        out_valid = uniq != vox.INVALID_KEY
        # overflow signal: true unique count vs the fixed-size buffer.
        # jnp.unique(size=) keeps the SMALLEST keys; anything beyond max_out
        # is a silently dropped active site — count them so callers can
        # surface truncation (scored locations in the reference).
        sk = jnp.sort(keys)
        first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        n_unique = jnp.sum(first & (sk != vox.INVALID_KEY))
        dropped = jnp.maximum(n_unique - max_out, 0).astype(jnp.int32)
        zdim, ydim, xdim = out_shape
        safe = jnp.where(out_valid, uniq, 0)
        oz = safe // (ydim * xdim)
        oy = (safe // xdim) % ydim
        ox = safe % xdim
        out_coords = jnp.stack([oz, oy, ox], axis=-1).astype(jnp.int32)
        return out_coords, out_valid, dropped

    return jax.vmap(per_item)(coords, valid)


class SparseConv3dDown(nn.Module):
    """Strided sparse conv (spconv.SparseConv3d): new, coarser active set.

    With a precomputed host rulebook (data/rulebook.py) the active-set
    derivation and gather map are free; otherwise both are built on-device.
    """
    out_channels: int
    kernel_size: Any = 3        # int or (kz, ky, kx)
    stride: Any = 2
    padding: Any = 1
    max_out_voxels: int = 16000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, st: SparseTensor,
                 precomputed: tuple | None = None,
                 window_pre: tuple | None = None) -> SparseTensor:
        kz, ky, kx = _tup3(self.kernel_size)
        k3 = kz * ky * kx
        cin = st.features.shape[-1]
        w = self.param("kernel", nn.initializers.kaiming_normal(),
                       (k3, cin, self.out_channels))
        out_shape = _downsample_shape(st.spatial_shape, self.kernel_size,
                                      self.stride, self.padding)
        if window_pre is not None:
            assert (kz, ky, kx) == (3, 3, 3)
            out_coords, out_valid, dwin = window_pre     # (B,Mo,3)(B,Mo)(B,Mo,9)
            gathered = batched_window_gather(st.features, dwin)
        elif precomputed is not None:
            out_coords, out_valid, down_idx = precomputed      # (B,Mo,3)(B,Mo)(B,Mo,K3)
            hit = (down_idx >= 0)[..., None].astype(st.features.dtype)
            safe = jnp.clip(down_idx, 0)
            gathered = jax.vmap(lambda f, i: f[i])(st.features, safe) * hit
        else:
            out_coords, out_valid, dropped = _downsample_active_set(
                st.coords, st.valid, st.spatial_shape, out_shape,
                self.kernel_size, self.stride, self.padding,
                self.max_out_voxels)
            # surface active-set truncation (opt-in: visible to callers that
            # apply with mutable=["intermediates"]; tested for VoxelNeXt's
            # dilated conv_out where dropped sites are scored locations)
            self.sow("intermediates", "dropped_sites", dropped)

            s = jnp.asarray(_tup3(self.stride), jnp.int32)
            p = jnp.asarray(_tup3(self.padding), jnp.int32)
            koffs = _kernel_offsets_aniso(self.kernel_size)

            def gather_item(in_c, in_v, in_f, oc, ov):
                table = vox.build_lookup(in_c, in_v, st.spatial_shape)
                src = oc[:, None, :] * s[None, None, :] - p[None, None, :] \
                    + koffs[None, :, :]                            # (Mo, K3, 3)
                sv = jnp.broadcast_to(ov[:, None], src.shape[:2])
                idx = vox.lookup(table, src, sv, st.spatial_shape)  # (Mo, K3)
                hit = (idx >= 0)[..., None].astype(in_f.dtype)
                return in_f[jnp.clip(idx, 0)] * hit                # (Mo, K3, Cin)

            gathered = jax.vmap(gather_item)(
                st.coords, st.valid, st.features, out_coords, out_valid)
        out = jnp.einsum("bmkc,kcd->bmd", gathered.astype(self.dtype),
                         w.astype(self.dtype))
        out = out * out_valid[..., None].astype(out.dtype)
        return SparseTensor(features=out, coords=out_coords, valid=out_valid,
                            spatial_shape=out_shape)


class SparseConvBlock(nn.Module):
    """conv (subm or strided) + masked BN(eps=1e-3, momentum=0.01) + ReLU.

    Reference post_act_block (spconv_backbone.py:8-27).
    """
    out_channels: int
    conv_type: str = "subm"     # subm | spconv
    stride: Any = 1
    padding: Any = 1
    kernel_size: Any = 3        # int or (kz, ky, kx); strided convs only
    max_out_voxels: int = 16000
    dtype: Any = jnp.float32
    fused_window: bool = False

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = False,
                 neighbor_idx: jnp.ndarray | None = None,
                 precomputed: tuple | None = None,
                 window: jnp.ndarray | None = None,
                 window_pre: tuple | None = None) -> SparseTensor:
        if self.conv_type == "subm":
            # fused kernel is forward-only (no VJP defined): eval path only
            st = SubMConv3d(self.out_channels, dtype=self.dtype,
                            fused_window=self.fused_window and not train,
                            name="conv")(st, neighbor_idx, window)
        elif self.conv_type == "spconv":
            st = SparseConv3dDown(self.out_channels,
                                  kernel_size=self.kernel_size,
                                  stride=self.stride,
                                  padding=self.padding,
                                  max_out_voxels=self.max_out_voxels,
                                  dtype=self.dtype, name="conv")(st, precomputed,
                                                                 window_pre)
        else:
            raise ValueError(self.conv_type)
        f = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         momentum=0.99, name="bn")(
            st.features,
            mask=jnp.broadcast_to(st.valid[..., None], st.features.shape)
            if train else None)
        f = nn.relu(f) * st.valid[..., None].astype(st.features.dtype)
        return st.replace(features=f)


class VoxelBackbone8x(nn.Module):
    """4-stage sparse U-stem: 16 -> 32 -> 64 -> 64 channels at strides 1/2/4/8.

    Reference VoxelBackBone8x (spconv_backbone.py:69-181). Submanifold layers
    sharing an ``indice_key`` reuse one neighbor-index map (built once per
    stage), mirroring spconv's rulebook caching.

    Returns multi_scale features {x_conv1..x_conv4} with strides {1, 2, 4, 8}.
    """
    max_voxels_per_stage: Tuple[int, int, int, int] = (16000, 16000, 8000, 4000)
    dtype: Any = jnp.float32
    x_window: bool = False
    x_window_fused: bool = False    # fused Pallas subm-conv (eval path)

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = False,
                 rulebook: Dict[str, jnp.ndarray] | None = None
                 ) -> Dict[str, SparseTensor]:
        caps = self.max_voxels_per_stage
        rb = rulebook
        xw = self.x_window and rb is not None and "win_0" in rb
        if xw:
            # x-window maps address key-sorted rows: reorder stage 0 once
            order = rb["order_0"]                         # (B, M0)
            st = st.replace(
                features=jnp.take_along_axis(st.features, order[..., None], 1),
                coords=jnp.take_along_axis(st.coords, order[..., None], 1),
                valid=jnp.take_along_axis(st.valid, order, 1))

        def stage_out(k):
            """(out_coords, out_valid) of down-stage k from the rulebook."""
            count = rb[f"count_{k}"]                      # (B,)
            mo = rb[f"coords_{k}"].shape[1]
            ov = jnp.arange(mo)[None, :] < count[:, None]
            return rb[f"coords_{k}"], ov

        def down_args(k):
            """kwargs for down-stage k's SparseConvBlock."""
            if rb is None:
                return {}
            oc, ov = stage_out(k)
            if xw:
                return {"window_pre": (oc, ov, rb[f"dwin_{k}"])}
            return {"precomputed": (oc, ov, rb[f"down_{k}"])}

        def subm_args(k, x):
            if xw:
                return {"window": rb[f"win_{k}"]}
            if rb is not None:
                return {"neighbor_idx": rb[f"nbr_{k}"]}
            return {"neighbor_idx": _neighbor_idx_subm(
                x.coords, x.valid, x.spatial_shape, 3)}

        # stage 1: conv_input + conv1 (subm, shared indice_key 'subm1')
        sub1 = subm_args(0, st)
        x = SparseConvBlock(16, "subm", dtype=self.dtype,
                            fused_window=self.x_window_fused,
                            name="conv_input")(st, train, **sub1)
        x1 = SparseConvBlock(16, "subm", dtype=self.dtype,
                            fused_window=self.x_window_fused,
                             name="conv1_0")(x, train, **sub1)

        # stage 2: strided down + 2 subm ('subm2')
        x = SparseConvBlock(32, "spconv", stride=2, padding=1,
                            max_out_voxels=caps[1], dtype=self.dtype,
                            name="conv2_down")(x1, train, **down_args(1))
        sub2 = subm_args(1, x)
        x = SparseConvBlock(32, "subm", dtype=self.dtype,
                            fused_window=self.x_window_fused,
                            name="conv2_1")(x, train, **sub2)
        x2 = SparseConvBlock(32, "subm", dtype=self.dtype,
                            fused_window=self.x_window_fused,
                             name="conv2_2")(x, train, **sub2)

        # stage 3
        x = SparseConvBlock(64, "spconv", stride=2, padding=1,
                            max_out_voxels=caps[2], dtype=self.dtype,
                            name="conv3_down")(x2, train, **down_args(2))
        sub3 = subm_args(2, x)
        x = SparseConvBlock(64, "subm", dtype=self.dtype,
                            fused_window=self.x_window_fused,
                            name="conv3_1")(x, train, **sub3)
        x3 = SparseConvBlock(64, "subm", dtype=self.dtype,
                            fused_window=self.x_window_fused,
                             name="conv3_2")(x, train, **sub3)

        # stage 4: z-padding 0 (reference spconv_backbone.py:104)
        x = SparseConvBlock(64, "spconv", stride=2, padding=(0, 1, 1),
                            max_out_voxels=caps[3], dtype=self.dtype,
                            name="conv4_down")(x3, train, **down_args(3))
        sub4 = subm_args(3, x)
        x = SparseConvBlock(64, "subm", dtype=self.dtype,
                            fused_window=self.x_window_fused,
                            name="conv4_1")(x, train, **sub4)
        x4 = SparseConvBlock(64, "subm", dtype=self.dtype,
                            fused_window=self.x_window_fused,
                             name="conv4_2")(x, train, **sub4)

        return {"x_conv1": x1, "x_conv2": x2, "x_conv3": x3, "x_conv4": x4}


BACKBONE_STRIDES = {"x_conv1": 1, "x_conv2": 2, "x_conv3": 4, "x_conv4": 8}
BACKBONE_CHANNELS = {"x_conv1": 16, "x_conv2": 32, "x_conv3": 64, "x_conv4": 64}
