"""RGB branch: frozen I3D -> middle-frame slice -> RoIAlign -> non-local -> embed.

Capability parity with reference model/gat_model.py:973-1095 (RGB_Backbone),
TPU-native: the whole branch is one jit program over fixed (MAX_PEOPLE,)
padded boxes. The reference truncates to person_num[0] (a batch-size-1
assumption, gat_model.py:1059); here all MAX_PEOPLE rois are pooled and
downstream consumers apply the validity mask.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import RGBBackboneConfig
from ..ops.roi_align import roi_align
from .i3d import ENDPOINT_CHANNELS, InceptionI3d
from .nonlocal_block import NLBlockND


class RGBBackbone(nn.Module):
    cfg: RGBBackboneConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, boxes: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """
        Args:
          images: (B, T, H, W, 3) normalized clips.
          boxes: (B, N, 4) xyxy boxes in input-image pixel coords (padded rows
            are (0, 0, 0, 0)).
        Returns:
          (B, N, embedding_dim) per-person features.
        """
        in_ch = ENDPOINT_CHANNELS[self.cfg.i3d_endpoint]

        feats = InceptionI3d(final_endpoint=self.cfg.i3d_endpoint,
                             dtype=self.dtype, name="i3d")(
            images, train=train and not self.cfg.i3d_freeze)
        if self.cfg.i3d_freeze:
            feats = jax.lax.stop_gradient(feats)

        # middle time slice (reference gat_model.py:1050)
        feats = feats[:, feats.shape[1] // 2]                      # (B, H', W', C)
        scale = feats.shape[2] / images.shape[3]                   # W_f / W

        # RoIAlign 5x5 per image (reference gat_model.py:1056-1057)
        def _pool(fmap, bxs):
            return roi_align(jnp.transpose(fmap, (2, 0, 1)), bxs,
                             out_size=5, spatial_scale=scale)      # (N, C, 5, 5)
        box_feats = jax.vmap(_pool)(feats, boxes)                  # (B, N, C, 5, 5)

        b, n = box_feats.shape[:2]
        # per-person 2D non-local self-attention (dim=2, dot)
        x = jnp.transpose(box_feats.reshape(b * n, in_ch, 5, 5), (0, 2, 3, 1))
        x = NLBlockND(in_channels=in_ch, inter_channels=in_ch // 8,
                      mode="dot", dtype=self.dtype, name="self_att")(x, train)
        x = jnp.mean(x, axis=(1, 2))                               # AdaptiveAvgPool2d(1)
        x = nn.Dense(self.cfg.embedding_dim,
                     kernel_init=nn.initializers.kaiming_normal(),
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype, name="embedding")(x)
        return x.reshape(b, n, self.cfg.embedding_dim)
