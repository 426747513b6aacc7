"""Point-feature extraction: keypoint sampling + voxel set abstraction.

Capability parity with pcdet/models/backbones_3d/pfe/voxel_set_abstraction.py
(VoxelSetAbstraction:124-411): FPS keypoints from raw points, then per-source
local aggregation (StackSAModuleMSG: multi-radius ball query -> relative-xyz
concat -> shared MLP -> max pool) over raw points, multi-scale sparse-conv
voxel centers, and bilinearly-interpolated BEV features; fused by a
Linear+BN+ReLU to the keypoint feature vector PV-RCNN's heads consume.

TPU-native design: per-item fixed shapes under vmap — keypoints are a static
count (short point lists wrap around, matching the reference's repeat-fill at
voxel_set_abstraction.py:258-261 in effect), ball query and grouping come
from ops/neighbor.py, and invalid supports are masked rather than sliced.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.sparse_backbone import SparseTensor
from ..ops.neighbor import ball_query, grouping_operation
from ..ops.sampling import farthest_point_sampling
from ..ops.voxel import get_voxel_centers


@dataclasses.dataclass(frozen=True)
class SALayerConfig:
    """One source's aggregation spec (SA_LAYER entries in pv-rcnn configs)."""
    source: str = "raw_points"            # raw_points | x_conv1.. | bev
    downsample_factor: int = 1
    radii: Tuple[float, ...] = (0.4, 0.8)
    nsamples: Tuple[int, ...] = (16, 16)
    mlps: Tuple[Tuple[int, ...], ...] = ((16, 16), (16, 16))


@dataclasses.dataclass(frozen=True)
class VSAConfig:
    num_keypoints: int = 2048
    num_output_features: int = 128
    sa_layers: Tuple[SALayerConfig, ...] = (
        SALayerConfig("raw_points", 1, (0.4, 0.8), (16, 16),
                      ((16, 16), (16, 16))),
        SALayerConfig("x_conv1", 1, (0.4, 0.8), (16, 16),
                      ((16, 16), (16, 16))),
        SALayerConfig("x_conv2", 2, (0.8, 1.2), (16, 32),
                      ((32, 32), (32, 32))),
        SALayerConfig("x_conv3", 4, (1.2, 2.4), (16, 32),
                      ((64, 64), (64, 64))),
        SALayerConfig("x_conv4", 8, (2.4, 4.8), (16, 32),
                      ((64, 64), (64, 64))),
    )
    use_bev: bool = True
    bev_stride: int = 8


class StackSAModuleMSG(nn.Module):
    """Multi-scale grouping SA layer (pointnet2_stack StackSAModuleMSG).

    For each (radius, nsample, mlp): ball-query supports around queries,
    concat (support_xyz - query_xyz, support_features), run the shared MLP,
    max-pool over samples; outputs are concatenated over scales.
    Operates on ONE item; vmap over the batch.
    """
    radii: Tuple[float, ...]
    nsamples: Tuple[int, ...]
    mlps: Tuple[Tuple[int, ...], ...]

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, features: Optional[jnp.ndarray],
                 new_xyz: jnp.ndarray,
                 valid: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        outs = []
        for i, (r, ns, mlp) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            idx, empty = ball_query(r, ns, xyz, new_xyz, valid)
            grouped_xyz = grouping_operation(xyz, idx) - new_xyz[:, None, :]
            if features is not None:
                grouped = jnp.concatenate(
                    [grouped_xyz, grouping_operation(features, idx)], -1)
            else:
                grouped = grouped_xyz
            h = grouped
            for j, ch in enumerate(mlp):
                h = nn.Dense(ch, use_bias=False, name=f"mlp{i}_{j}")(h)
                h = nn.BatchNorm(use_running_average=not train,
                                 epsilon=1e-3, name=f"mlp{i}_{j}_bn")(h)
                h = nn.relu(h)
            h = jnp.max(h, axis=1)                             # (M, C)
            h = h * (~empty)[:, None].astype(h.dtype)
            outs.append(h)
        return jnp.concatenate(outs, -1)


def bilinear_interpolate_bev(bev: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                             ) -> jnp.ndarray:
    """(H, W, C) map sampled at fractional (x, y) — voxel_set_abstraction.py
    bilinear_interpolate_torch analogue, one item."""
    h, w, _ = bev.shape
    # clamp the BASE cell to w-2/h-2 so boundary queries interpolate the
    # edge value instead of collapsing to four zero weights (x0==x1 made
    # all weights vanish for x >= w-1, zeroing far-range keypoints)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    x1 = x0 + 1
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    y1 = y0 + 1
    xa = jnp.clip(x, 0, w - 1).astype(bev.dtype)
    ya = jnp.clip(y, 0, h - 1).astype(bev.dtype)
    wa = (x1 - xa) * (y1 - ya)
    wb = (x1 - xa) * (ya - y0)
    wc = (xa - x0) * (y1 - ya)
    wd = (xa - x0) * (ya - y0)
    return (bev[y0, x0] * wa[:, None] + bev[y1, x0] * wb[:, None]
            + bev[y0, x1] * wc[:, None] + bev[y1, x1] * wd[:, None])


class VoxelSetAbstraction(nn.Module):
    """FPS keypoints + multi-source aggregation + fusion (PV-RCNN's PFE)."""
    cfg: VSAConfig
    voxel_size: Tuple[float, float, float]
    point_cloud_range: Tuple[float, ...]

    @nn.compact
    def __call__(self, points: jnp.ndarray, point_valid: jnp.ndarray,
                 multi_scale: Dict[str, SparseTensor],
                 bev: Optional[jnp.ndarray] = None, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        """points (B, N, 3+f); returns {"keypoints" (B, K, 3),
        "features" (B, K, F), "features_before_fusion" (B, K, Craw)}."""
        c = self.cfg

        def sample_item(pts, pv):
            idx = farthest_point_sampling(pts[:, :3], c.num_keypoints, pv)
            return pts[idx, :3]

        keypoints = jax.vmap(sample_item)(points, point_valid)  # (B, K, 3)

        feats = []
        for sa_cfg in c.sa_layers:
            sa = StackSAModuleMSG(sa_cfg.radii, sa_cfg.nsamples, sa_cfg.mlps,
                                  name=f"sa_{sa_cfg.source}")
            if sa_cfg.source == "raw_points":
                pf = points[:, :, 3:] if points.shape[-1] > 3 \
                    else jnp.zeros(points.shape[:2] + (1,), points.dtype)
                f = jax.vmap(lambda a, b2, c2, d2: sa(a, b2, c2, d2, train=train))(
                    points[:, :, :3], pf, keypoints, point_valid)
            else:
                st = multi_scale[sa_cfg.source]
                centers = jax.vmap(lambda cz: get_voxel_centers(
                    cz, sa_cfg.downsample_factor, self.voxel_size,
                    self.point_cloud_range))(st.coords)
                f = jax.vmap(lambda a, b2, c2, d2: sa(a, b2, c2, d2,
                                                      train=train))(
                    centers, st.features, keypoints, st.valid)
            feats.append(f)

        if c.use_bev and bev is not None:
            vx, vy = self.voxel_size[0], self.voxel_size[1]
            x_idx = (keypoints[..., 0] - self.point_cloud_range[0]) \
                / (vx * c.bev_stride)
            y_idx = (keypoints[..., 1] - self.point_cloud_range[1]) \
                / (vy * c.bev_stride)
            feats.append(jax.vmap(bilinear_interpolate_bev)(bev, x_idx, y_idx))

        raw = jnp.concatenate(feats, -1)                        # (B, K, Craw)
        fused = nn.Dense(c.num_output_features, use_bias=False,
                         name="fusion")(raw)
        fused = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                             name="fusion_bn")(fused)
        fused = nn.relu(fused)
        return {"keypoints": keypoints, "features": fused,
                "features_before_fusion": raw}
