"""ROI grid pooling over multi-scale sparse voxel features.

Capability parity with reference pcdet/models/roi_heads/voxelrcnn_head.py:8-239
(as modified by the reference: rois come from GT 3D boxes, detection heads are
gutted) and pcdet's NeighborVoxelSAModuleMSG (voxel_pool_modules.py:8-130) +
voxel_query/group_points CUDA kernels — rebuilt on the sorted-key voxel_query
in ops/voxel.py.

Per box: a 6x6x6 grid of query points (yaw-rotated, box-local), each pooling
<=16 neighbor voxels within a per-scale radius through a tiny per-scale MLP,
max-pooled and concatenated over the x_conv2/3/4 scales -> (N, 216, 96).
All shapes are static: boxes padded to MAX_PEOPLE, masked BatchNorm everywhere.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import LiDARBackboneConfig, PointCloudConfig
from ..ops import voxel as vox
from ..ops.geometry import rotate_points_along_z
from .layers import MaskedBatchNorm
from .sparse_backbone import BACKBONE_STRIDES, SparseTensor


def roi_grid_points(rois: jnp.ndarray, grid_size: int) -> jnp.ndarray:
    """Global xyz of the dense grid points of each ROI.

    Reference voxelrcnn_head.py:167-188: grid index + 0.5 scaled into the box
    extent, centered, yaw-rotated, translated to the box center.

    Args:
      rois: (N, 7) boxes (cx, cy, cz, dx, dy, dz, yaw).
    Returns:
      (N, G^3, 3) global grid points.
    """
    g = jnp.arange(grid_size, dtype=rois.dtype)
    gx, gy, gz = jnp.meshgrid(g, g, g, indexing="ij")
    dense_idx = jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=-1)  # (G3, 3)
    local_size = rois[:, 3:6]                                             # (N, 3)
    pts = (dense_idx[None] + 0.5) / grid_size * local_size[:, None] \
        - local_size[:, None] / 2                                         # (N, G3, 3)
    pts = rotate_points_along_z(pts, rois[:, 6])
    return pts + rois[:, None, 0:3]


class NeighborVoxelPoolLayer(nn.Module):
    """One scale of NeighborVoxelSAModuleMSG (voxel_pool_modules.py:8-130).

    mlp_in (1x1 conv + BN) on voxel features, voxel_query grouping, position
    MLP (3 -> C + BN) on center offsets, sum + ReLU, max over nsample,
    mlp_out (1x1 conv + BN + ReLU).
    """
    mlp_mid: int
    mlp_out: int
    query_range: Tuple[int, int, int]
    radius: float
    nsample: int
    voxel_size: Sequence[float]
    point_cloud_range: Sequence[float]
    stride: int
    pool_method: str = "max_pool"
    exact_query: bool = False      # strict-compat scan-order voxel_query
    cull_k: int = 0                # >0: per-box culled query (queries must
    #                                arrive grouped as N boxes x G3 points)
    query_groups: int = 1          # G3 when cull_k > 0
    approx_nsample: bool = False   # approx_max_k neighbor selection
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, st: SparseTensor, query_xyz: jnp.ndarray,
                 query_valid: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """
        Args:
          st: this scale's sparse features, (B, M, C).
          query_xyz: (B, R, 3) metric query points.
          query_valid: (B, R) bool.
        Returns:
          (B, R, mlp_out) pooled features.
        """
        b, m, cin = st.features.shape

        # mlp_in: pointwise conv + masked BN over all valid voxels
        f = nn.Dense(self.mlp_mid, use_bias=False,
                     kernel_init=nn.initializers.kaiming_normal(),
                     dtype=self.dtype, name="mlp_in")(st.features)
        f = MaskedBatchNorm(momentum=0.99, epsilon=1e-5, name="mlp_in_bn")(
            f, mask=st.valid, use_running_average=not train)
        f = f * st.valid[..., None].astype(f.dtype)

        vs = jnp.asarray(self.voxel_size, jnp.float32)
        pc_min = jnp.asarray(self.point_cloud_range[:3], jnp.float32)

        def per_item(coords, valid, feats, q_xyz, q_valid):
            centers = vox.get_voxel_centers(coords, self.stride, self.voxel_size,
                                            self.point_cloud_range)
            # query voxel coords at this scale (reference voxelrcnn_head.py:103-107
            # + //stride at :142), zyx order
            q_grid = jnp.floor((q_xyz - pc_min) / vs).astype(jnp.int32) \
                // self.stride
            q_zyx = q_grid[:, ::-1]
            if self.cull_k > 0 and not self.exact_query:
                g3 = self.query_groups
                n_boxes = q_xyz.shape[0] // g3
                _, empty, cand, local = vox.voxel_query_boxed(
                    centers, coords, valid,
                    q_xyz.reshape(-1, g3, 3), q_zyx.reshape(-1, g3, 3),
                    q_valid.reshape(-1, g3),
                    self.query_range, self.radius, self.nsample,
                    cull_k=self.cull_k, return_local=True,
                    approx_nsample=self.approx_nsample)
                # gather-as-GEMM: random row-gathers are slow on TPU, so
                # gather each box's K candidates once, then pull the
                # selected neighbors through a one-hot matmul on the MXU
                # (bitwise-identical to feats[idx])
                kk = cand.shape[1]
                s = local.shape[1]
                cand_rows = jnp.concatenate(
                    [feats[cand], centers[cand]], axis=-1)       # (N, K, C+3)
                oh = (local.reshape(n_boxes, g3 * s)[:, :, None]
                      == jnp.arange(kk)[None, None, :]).astype(feats.dtype)
                grouped = jnp.einsum("nqk,nkc->nqc", oh, cand_rows)
                grouped = grouped.reshape(-1, s, grouped.shape[-1])
                grouped_f = grouped[..., :feats.shape[-1]]           # (R, S, C)
                grouped_xyz = (grouped[..., feats.shape[-1]:]
                               - q_xyz[:, None, :])                  # (R, S, 3)
            else:
                idx, empty = vox.voxel_query(
                    None, centers, q_xyz, q_zyx, q_valid, st.spatial_shape,
                    self.query_range, self.radius, self.nsample,
                    voxel_coords=coords, voxel_valid=valid,
                    exact=self.exact_query)
                grouped_f = feats[idx]                               # (R, S, C)
                grouped_xyz = centers[idx] - q_xyz[:, None, :]       # (R, S, 3)
            zero = (~empty)[:, None, None].astype(grouped_f.dtype)
            return grouped_f * zero, grouped_xyz * zero, empty

        # unrolled over the (small, static) batch instead of vmapped: vmap
        # lowers the feats[cand] row-gathers to ONE batched gather, which TPU
        # executes super-linearly in B (same mechanism as the sparse
        # backbone's batched_window_gather — pool per-clip ms inflated
        # 12.84 -> 14.66 b1->b4, ROUND5_NOTES). B copies of the b1 gather
        # keep each item on the b1 fast path; exact (same per-item math).
        if st.features.shape[0] == 1:
            g1, x1, e1 = per_item(st.coords[0], st.valid[0], f[0],
                                  query_xyz[0], query_valid[0])
            grouped_f, grouped_xyz, empty = g1[None], x1[None], e1[None]
        else:
            parts = [per_item(st.coords[i], st.valid[i], f[i],
                              query_xyz[i], query_valid[i])
                     for i in range(st.features.shape[0])]
            grouped_f = jnp.stack([p[0] for p in parts])
            grouped_xyz = jnp.stack([p[1] for p in parts])
            empty = jnp.stack([p[2] for p in parts])

        # position MLP: 3 -> C pointwise + masked BN over (B, R, S)
        pos = nn.Dense(self.mlp_mid, use_bias=False,
                       kernel_init=nn.initializers.kaiming_normal(),
                       dtype=self.dtype, name="mlp_pos")(grouped_xyz)
        # empty-query rows (zeroed offsets) stay in the BN statistics —
        # the reference's BatchNorm1d also sees them (voxel_pool_modules.py
        # zeroes grouped tensors before the position MLP + BN)
        pos = MaskedBatchNorm(momentum=0.99, epsilon=1e-5, name="mlp_pos_bn")(
            pos, mask=query_valid[:, :, None],
            use_running_average=not train)

        x = nn.relu(grouped_f + pos)                                 # (B, R, S, C)
        if self.pool_method == "max_pool":
            x = jnp.max(x, axis=2)
        else:
            x = jnp.mean(x, axis=2)

        x = nn.Dense(self.mlp_out, use_bias=False,
                     kernel_init=nn.initializers.kaiming_normal(),
                     dtype=self.dtype, name="mlp_out")(x)
        x = MaskedBatchNorm(momentum=0.99, epsilon=1e-5, name="mlp_out_bn")(
            x, mask=query_valid, use_running_average=not train)
        x = nn.relu(x)
        return x * query_valid[..., None].astype(x.dtype)


class ROIGridPool(nn.Module):
    """Multi-scale grid pooling + optional shared FC (VoxelRCNNHead.forward)."""
    cfg: LiDARBackboneConfig
    pc_cfg: PointCloudConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ms_features: Dict[str, SparseTensor], rois: jnp.ndarray,
                 roi_valid: jnp.ndarray, train: bool = False,
                 compute_shared_fc: bool = False):
        """
        Args:
          ms_features: multi-scale sparse tensors from VoxelBackbone8x.
          rois: (B, N, 7) GT 3D boxes (padded rows zero).
          roi_valid: (B, N) bool.
        Returns:
          pooled: (B, N, G^3, sum(mlp_out)) grid features;
          shared: (B, N, shared_fc[-1]) or None.
        """
        b, n = rois.shape[:2]
        g3 = self.cfg.grid_pool_size ** 3
        grid_xyz = jax.vmap(
            lambda r: roi_grid_points(r, self.cfg.grid_pool_size))(rois)
        grid_xyz = grid_xyz.reshape(b, n * g3, 3)
        grid_valid = jnp.repeat(roi_valid, g3, axis=1)              # (B, N*G3)

        pooled = []
        for layer_cfg in self.cfg.pool_layers:
            st = ms_features[layer_cfg.source]
            stride = BACKBONE_STRIDES[layer_cfg.source]
            out = NeighborVoxelPoolLayer(
                mlp_mid=layer_cfg.mlps[0], mlp_out=layer_cfg.mlps[1],
                query_range=tuple(layer_cfg.query_range),
                radius=layer_cfg.radius, nsample=layer_cfg.nsample,
                voxel_size=self.pc_cfg.voxel.voxel_size,
                point_cloud_range=self.pc_cfg.range, stride=stride,
                pool_method=layer_cfg.pool_method,
                exact_query=getattr(self.cfg, "voxel_query_exact", False),
                cull_k=getattr(self.cfg, "pool_cull_k", 0),
                approx_nsample=getattr(self.cfg, "pool_approx_nsample",
                                       False),
                query_groups=g3,
                dtype=self.dtype,
                name=f"pool_{layer_cfg.source}",
            )(st, grid_xyz, grid_valid, train)
            pooled.append(out)
        pooled = jnp.concatenate(pooled, axis=-1)                   # (B, N*G3, 96)
        pooled = pooled.reshape(b, n, g3, pooled.shape[-1])

        shared = None
        if compute_shared_fc:
            x = pooled.reshape(b, n, -1)
            for k, width in enumerate(self.cfg.shared_fc):
                x = nn.Dense(width, use_bias=False,
                             kernel_init=nn.initializers.xavier_normal(),
                             dtype=self.dtype, name=f"shared_fc_{k}")(x)
                x = MaskedBatchNorm(momentum=0.99, epsilon=1e-5,
                                    name=f"shared_fc_bn_{k}")(
                    x, mask=roi_valid, use_running_average=not train)
                x = nn.relu(x)
                if k != len(self.cfg.shared_fc) - 1 and self.cfg.dp_ratio > 0:
                    x = nn.Dropout(self.cfg.dp_ratio,
                                   deterministic=not train)(x)
            shared = x * roi_valid[..., None].astype(x.dtype)
        return pooled, shared
