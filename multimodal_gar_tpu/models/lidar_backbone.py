"""LiDAR branch: MeanVFE -> sparse backbone -> ROI grid pool -> non-local -> embed.

Capability parity with reference model/gat_model.py:868-971 (LiDAR_Backbone,
active config: SELF_ATT1.USE=True, DIM=3, INTER_PERSON=False) wrapping the
gutted VoxelRCNN feature extractor (pcdet detectors/voxel_rcnn.py:4-13).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..config import LiDARBackboneConfig, PointCloudConfig
from .nonlocal_block import NLBlockND
from .roi_grid_pool import ROIGridPool
from .spa_temp import SpaTempSelfAtt
from .sparse_backbone import SparseTensor, VoxelBackbone8x


def mean_vfe(voxels: jnp.ndarray, num_points: jnp.ndarray) -> jnp.ndarray:
    """Mean of the (<=P) raw points in each voxel (reference mean_vfe.py:14-32).

    Args:
      voxels: (B, M, P, C) padded per-voxel point features.
      num_points: (B, M) real point counts.
    Returns:
      (B, M, C) voxel features.
    """
    total = jnp.sum(voxels, axis=2)
    denom = jnp.maximum(num_points, 1).astype(total.dtype)[..., None]
    return total / denom


class LiDARBackbone(nn.Module):
    cfg: LiDARBackboneConfig
    pc_cfg: PointCloudConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, voxels: jnp.ndarray, voxel_coords: jnp.ndarray,
                 voxel_num_points: jnp.ndarray, voxel_valid: jnp.ndarray,
                 rois: jnp.ndarray, roi_valid: jnp.ndarray,
                 train: bool = False, rulebook: dict | None = None) -> jnp.ndarray:
        """
        Args:
          voxels: (B, M, P, 4) raw per-voxel points (x, y, z, intensity).
          voxel_coords: (B, M, 3) int32 zyx voxel coords.
          voxel_num_points: (B, M) int32.
          voxel_valid: (B, M) bool.
          rois: (B, N, 7) GT 3D boxes.
          roi_valid: (B, N) bool.
        Returns:
          (B, N, embedding_dim) per-person LiDAR features.
        """
        nx, ny, nz = self.pc_cfg.grid_size
        # spconv convention: sparse_shape = (Z+1, Y, X) (spconv_backbone.py:75)
        spatial_shape = (nz + 1, ny, nx)

        feats = mean_vfe(voxels, voxel_num_points)
        feats = feats * voxel_valid[..., None].astype(feats.dtype)
        st = SparseTensor(features=feats.astype(self.dtype),
                          coords=voxel_coords, valid=voxel_valid,
                          spatial_shape=spatial_shape)

        ms = VoxelBackbone8x(
            max_voxels_per_stage=self.cfg.max_voxels_per_stage,
            dtype=self.dtype,
            x_window=getattr(self.cfg, "x_window", False),
            x_window_fused=getattr(self.cfg, "x_window_fused", False),
            name="backbone3d")(st, train, rulebook)

        # shared FC is only consumed when the self-attention head is off
        # (reference computes-but-discards it under SELF_ATT1; we skip the
        # dead compute — gat_model.py:934-947 uses pooled_features only).
        pooled, shared = ROIGridPool(
            self.cfg, self.pc_cfg, dtype=self.dtype, name="roi_grid_pool")(
            ms, rois, roi_valid, train,
            compute_shared_fc=not self.cfg.self_att_use)

        b, n, g3, c = pooled.shape
        g = self.cfg.grid_pool_size

        if self.cfg.two_stage_att:
            # SpaTemp 'flat' path (reference gat_model.py:887-929): avg-pool z,
            # 2D NL within each person's 6x6 grid, flatten, 1D NL across people
            x = pooled.reshape(b * n, g, g, g, c)
            x = jnp.mean(x, axis=3)                              # pool z -> (BN,6,6,C)
            x = SpaTempSelfAtt(c, max(c // 8, 1), "dot", pool="flat",
                               dtype=self.dtype, name="self_att")(x, train)
            x = x.reshape(b, n, -1)
        elif not self.cfg.self_att_use:
            return shared
        elif self.cfg.self_att_inter_person:
            # attention across people too (reference gat_model.py:949-969):
            # z-avg-pool to (N, 6, 6, C), 3D NL with persons as the 3rd axis
            x = pooled.reshape(b, n, g, g, g, c).mean(axis=4)    # (B,N,6,6,C)
            x = NLBlockND(in_channels=c, inter_channels=max(c // 8, 1),
                          mode="dot", dtype=self.dtype, name="self_att")(x, train)
            x = x.reshape(b, n, -1)                              # (B, N, 6*6*C)
        else:
            # per-person 3D NL over the 6x6x6 grid (the active config,
            # gat_model.py:934-947)
            x = pooled.reshape(b * n, g, g, g, c)
            x = NLBlockND(in_channels=c, inter_channels=max(c // 8, 1),
                          mode="dot", dtype=self.dtype, name="self_att")(
                x, train, valid=roi_valid.reshape(b * n))
            x = x.reshape(b, n, g3 * c)
        x = nn.Dense(self.cfg.embedding_dim,
                     kernel_init=nn.initializers.kaiming_normal(),
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype, name="embedding")(x)
        return x * roi_valid[..., None].astype(x.dtype)
