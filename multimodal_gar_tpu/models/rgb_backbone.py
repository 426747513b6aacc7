"""RGB branch: frozen I3D -> middle-frame slice -> RoIAlign -> attention -> embed.

Capability parity with reference model/gat_model.py:973-1095 (RGB_Backbone),
including every attention option:
  - default: per-person 2D non-local block (dim=2, dot) — the active config;
  - INTER_PERSON: 3D non-local across (person, H, W) (gat_model.py:1064-1075);
  - two_stage_att: SpaTemp_self_att (2D within-person + 1D across-person);
  - GAT_module: GATv2 over the fully-connected actor graph (:1082-1094).

TPU-native: one jit program over fixed (MAX_PEOPLE,) padded boxes. The
reference truncates to person_num[0] (a batch-size-1 assumption,
gat_model.py:1059); here all MAX_PEOPLE rois are pooled and downstream
consumers apply the validity mask.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import RGBBackboneConfig
from ..ops.roi_align import roi_align
from .gat import GATv2Layer
from .i3d import ENDPOINT_CHANNELS, InceptionI3d
from .nonlocal_block import NLBlockND
from .spa_temp import SpaTempSelfAtt


class RGBBackbone(nn.Module):
    cfg: RGBBackboneConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, boxes: jnp.ndarray,
                 train: bool = False,
                 valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """
        Args:
          images: (B, T, H, W, 3) normalized clips.
          boxes: (B, N, 4) xyxy boxes in input-image pixel coords (padded rows
            are (0, 0, 0, 0)).
          valid: optional (B, N) actor mask (needed by INTER_PERSON/GAT paths).
        Returns:
          (B, N, embedding_dim) per-person features.
        """
        in_ch = ENDPOINT_CHANNELS[self.cfg.i3d_endpoint]
        if valid is None:
            valid = jnp.any(boxes != 0, axis=-1)

        bf16_body = getattr(self.cfg, "i3d_bf16_body", False)
        i3d_train = train and not self.cfg.i3d_freeze
        # cone culling is exact only when BN uses running stats: train-mode
        # BN would compute batch statistics over the culled temporal extent
        center = (getattr(self.cfg, "i3d_center_slice", False)
                  and self.cfg.i3d_endpoint == "Mixed_4f" and not i3d_train)
        feats = InceptionI3d(final_endpoint=self.cfg.i3d_endpoint,
                             pallas_stem=self.cfg.pallas_stem,
                             stem_passes=getattr(self.cfg,
                                                 "pallas_stem_passes", 3),
                             stem_cmajor=getattr(self.cfg,
                                                 "pallas_stem_cmajor",
                                                 False),
                             stem_dimajor=getattr(self.cfg,
                                                  "pallas_stem_dimajor",
                                                  False),
                             stem_pipelined=getattr(self.cfg,
                                                    "pallas_stem_pipelined",
                                                    False),
                             remat=self.cfg.i3d_remat,
                             t2d=getattr(self.cfg, "i3d_t2d", False),
                             body_dtype=jnp.bfloat16 if bf16_body else None,
                             center_slice=center,
                             batch_unroll=(
                                 getattr(self.cfg, "i3d_batch_unroll", False)
                                 and not i3d_train),
                             dtype=self.dtype, name="i3d")(
            images, train=i3d_train)
        feats = feats.astype(self.dtype)
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
        patches = jnp.transpose(box_feats, (0, 1, 3, 4, 2))        # (B, N, 5, 5, C)

        if self.cfg.two_stage_att:
            # batch folded into the entity axis (cross-entity attention then
            # spans the batch — matches the reference's batch-size-1 regime)
            x = SpaTempSelfAtt(in_ch, in_ch // 8, "dot", dtype=self.dtype,
                               name="self_att")(
                patches.reshape(b * n, 5, 5, in_ch), train)
            x = x.reshape(b, n, in_ch)
        elif self.cfg.inter_person:
            # 3D non-local with persons as the third axis (gat_model.py:1064-1075)
            x = NLBlockND(in_ch, in_ch // 8, "dot", dtype=self.dtype,
                          name="self_att")(patches, train)         # (B,N,5,5,C)
            x = jnp.mean(x, axis=(2, 3))                           # avg pool
        else:
            nl_valid = None if valid is None else valid.reshape(b * n)
            x = NLBlockND(in_ch, in_ch // 8, "dot", dtype=self.dtype,
                          name="self_att")(
                patches.reshape(b * n, 5, 5, in_ch), train,
                valid=nl_valid)
            x = jnp.mean(x, axis=(1, 2)).reshape(b, n, in_ch)

        x = nn.Dense(self.cfg.embedding_dim,
                     kernel_init=nn.initializers.kaiming_normal(),
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype, name="embedding")(x)

        if self.cfg.gat_module:
            x = GATv2Layer(self.cfg.embedding_dim, num_heads=8,
                           dropout_rate=0.5, dtype=self.dtype,
                           name="gat")(x, valid, deterministic=not train)
        return x
