"""Sparse-to-BEV projection and 2D BEV backbones.

Capability parity with pcdet/models/backbones_2d/:
  - HeightCompression (map_to_bev/height_compression.py:4-26): densify the
    encoded sparse tensor and fold Z into channels.
  - PointPillarScatter (map_to_bev/pointpillar_scatter.py:5-37): scatter
    pillar features into a dense (ny, nx) canvas.
  - Conv2DCollapse (map_to_bev/conv2d_collapse.py): 1x1-conv Z collapse.
  - BaseBEVBackbone (base_bev_backbone.py:6-112): strided conv blocks +
    transposed-conv upsample branches, concatenated.

TPU-native design: all maps are NHWC; the sparse->dense scatter is one
fixed-shape ``scatter`` on (B, D*H*W, C) from the padded SparseTensor layout
(invalid rows land in a trash row). BatchNorm follows the reference's
eps=1e-3; running stats use flax's momentum convention.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.sparse_backbone import SparseTensor


def sparse_to_dense_bev(st: SparseTensor) -> jnp.ndarray:
    """SparseTensor (B, M, C) + zyx coords -> dense NHWC (B, H, W, D*C).

    HeightCompression semantics (height_compression.py:20-24): dense
    (B, C, D, H, W) viewed as (B, C*D, H, W); our NHWC equivalent keeps the
    same (c, d) channel pairing order transposed to (d, c) — documented so
    checkpoint converters can permute.
    """
    b, m, c = st.features.shape
    d, h, w = st.spatial_shape
    flat = jnp.where(
        st.valid, (st.coords[..., 0] * h + st.coords[..., 1]) * w
        + st.coords[..., 2], d * h * w)                     # trash row at end
    dense = jnp.zeros((b, d * h * w + 1, c), st.features.dtype)
    dense = jax.vmap(lambda dn, f_, fl: dn.at[fl].set(f_))(
        dense, st.features, flat)[:, :-1]
    dense = dense.reshape(b, d, h, w, c)
    return jnp.transpose(dense, (0, 2, 3, 1, 4)).reshape(b, h, w, d * c)


def pillar_scatter(features: jnp.ndarray, coords: jnp.ndarray,
                   valid: jnp.ndarray, grid_size: Tuple[int, int]
                   ) -> jnp.ndarray:
    """(B, P, C) pillar features + zyx coords (z==0) -> (B, ny, nx, C).

    PointPillarScatter (pointpillar_scatter.py:14-37) without the per-item
    Python loop: one batched scatter into a fixed canvas.
    """
    nx, ny = grid_size
    b, p, c = features.shape
    flat = jnp.where(valid, coords[..., 1] * nx + coords[..., 2], ny * nx)
    canvas = jnp.zeros((b, ny * nx + 1, c), features.dtype)
    canvas = jax.vmap(lambda cv, f, fl: cv.at[fl].set(f))(
        canvas, features, flat)[:, :-1]
    return canvas.reshape(b, ny, nx, c)


class Conv2DCollapse(nn.Module):
    """Z-collapse by 1x1 conv over stacked (D*C) channels
    (map_to_bev/conv2d_collapse.py — CaDDN's frustum-to-BEV)."""
    num_bev_features: int

    @nn.compact
    def __call__(self, dense_zc: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.num_bev_features, (1, 1), use_bias=False,
                    name="conv")(dense_zc)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         name="bn")(x)
        return nn.relu(x)


class BaseBEVBackbone(nn.Module):
    """Multi-scale 2D conv trunk + upsample-concat FPN
    (base_bev_backbone.py:6-112). NHWC.

    layer_nums/strides/filters define the downsampling blocks;
    upsample_strides/num_upsample_filters the transposed-conv branches.
    """
    layer_nums: Tuple[int, ...] = (5, 5)
    layer_strides: Tuple[int, ...] = (1, 2)
    num_filters: Tuple[int, ...] = (128, 256)
    upsample_strides: Tuple[int, ...] = (1, 2)
    num_upsample_filters: Tuple[int, ...] = (256, 256)

    @property
    def num_bev_features(self) -> int:
        n = sum(self.num_upsample_filters)
        return n if n else self.num_filters[-1]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def conv_bn_relu(h, ch, stride, name, explicit_pad=False):
            # the reference wraps each block's first conv in ZeroPad2d(1)
            # (symmetric (1,1)); flax SAME pads (0,1) for stride 2 on even
            # inputs, a one-pixel shift that breaks converted-weight parity.
            pad = ((1, 1), (1, 1)) if explicit_pad else "SAME"
            h = nn.Conv(ch, (3, 3), strides=(stride, stride), use_bias=False,
                        padding=pad, name=f"{name}_conv")(h)
            h = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                             name=f"{name}_bn")(h)
            return nn.relu(h)

        ups = []
        for i, (n_lay, stride, ch) in enumerate(
                zip(self.layer_nums, self.layer_strides, self.num_filters)):
            x = conv_bn_relu(x, ch, stride, f"block{i}_down",
                             explicit_pad=True)
            for k in range(n_lay):
                x = conv_bn_relu(x, ch, 1, f"block{i}_l{k}")
            if self.upsample_strides:
                us = self.upsample_strides[i]
                if us >= 1:
                    u = nn.ConvTranspose(
                        self.num_upsample_filters[i], (us, us),
                        strides=(us, us), use_bias=False,
                        name=f"deblock{i}_deconv")(x)
                else:
                    s = int(round(1 / us))
                    u = nn.Conv(self.num_upsample_filters[i], (s, s),
                                strides=(s, s), use_bias=False,
                                name=f"deblock{i}_conv")(x)
                u = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                                 name=f"deblock{i}_bn")(u)
                ups.append(nn.relu(u))
            else:
                ups.append(x)
        out = jnp.concatenate(ups, -1) if len(ups) > 1 else ups[0]
        if len(self.upsample_strides) > len(self.layer_nums):
            us = self.upsample_strides[-1]
            out = nn.ConvTranspose(out.shape[-1], (us, us), strides=(us, us),
                                   use_bias=False, name="deblock_extra")(out)
            out = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                               name="deblock_extra_bn")(out)
            out = nn.relu(out)
        return out
