"""PV-RCNN++: proposal-centric keypoints + VectorPool aggregation.

Capability parity with pcdet/models/detectors/pv_rcnn_plusplus.py:8-53 and
the PV-RCNN++ pieces of voxel_set_abstraction.py (sample_points_with_roi
:20-57, sector_fps :60-121, sectorized_proposal_centric_sampling :206-225)
plus the VectorPoolAggregation modules (pointnet2_stack vector_pool kernels,
SURVEY.md §2.6): proposals come first, keypoints are FPS'd per azimuth
sector from the points near proposals, and all local aggregation uses the
fixed local-sub-voxel vector pooling (ops/vector_pool.py) instead of
ball-query MSG.

TPU-native design: proposal-distance filtering is a mask (points outside
keep their slot, marked invalid); sector FPS allocates a fixed keypoint
quota per sector and runs masked FPS per sector under vmap.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sampling import farthest_point_sampling
from ..ops.vector_pool import vector_pool
from ..ops.voxel import get_voxel_centers
from .dense_heads import AnchorHeadSingle
from .detectors import (DetBatch, DetectorConfig, VoxelDenseTrunk,
                        anchor_set_for, register_detector, _coder)
from .pfe import bilinear_interpolate_bev
from .point_heads import (PointHeadConfig, PointHeadSimple,
                          assign_point_targets, point_cls_loss)
from .roi_detectors import (RefinementMLP, RoIHeadConfig, _stage1_proposals,
                            _two_stage_loss, _two_stage_predict)
from .roi_heads import roi_grid_points


@dataclasses.dataclass(frozen=True)
class PVPPConfig:
    num_keypoints: int = 2048
    num_sectors: int = 6
    sample_radius_with_roi: float = 1.6
    num_output_features: int = 90
    vp_grid_size: int = 3
    vp_radii: Tuple[float, ...] = (0.8, 1.6)     # raw-point scales
    vp_mlp: int = 32
    vsa_sources: Tuple[Tuple[str, int, float], ...] = (
        ("x_conv3", 4, 1.2), ("x_conv4", 8, 2.4))
    use_bev: bool = True
    bev_stride: int = 8


class VectorPoolLocalAgg(nn.Module):
    """VectorPoolAggregation: local sub-voxel means -> per-cell MLP -> sum.

    One scale, one item (vmap outside). The reference's separate_local_agg
    with dense grid 3^3 and channel-reduced output."""
    out_channels: int
    radius: float
    grid_size: int = 3

    @nn.compact
    def __call__(self, support_xyz, support_feats, support_valid, query_xyz):
        pooled, counts = vector_pool(support_xyz, support_feats,
                                     support_valid, query_xyz, self.radius,
                                     self.grid_size)        # (M, G3, 3+C)
        h = nn.Dense(self.out_channels, name="cell_mlp")(pooled)
        h = nn.relu(h) * (counts > 0)[..., None].astype(h.dtype)
        m, g3, c = h.shape
        return nn.Dense(self.out_channels,
                        name="merge")(h.reshape(m, g3 * c))


def sector_fps(points: jnp.ndarray, valid: jnp.ndarray, num_keypoints: int,
               num_sectors: int) -> jnp.ndarray:
    """Sectorized FPS (voxel_set_abstraction.sector_fps:60-121): split by
    azimuth, FPS a proportional quota per sector. Fixed quota = K/S."""
    quota = num_keypoints // num_sectors
    angle = jnp.arctan2(points[:, 1], points[:, 0]) + np.pi   # [0, 2pi)
    sector = jnp.clip((angle / (2 * np.pi / num_sectors)).astype(jnp.int32),
                      0, num_sectors - 1)

    def per_sector(s):
        mask = valid & (sector == s)
        idx = farthest_point_sampling(points[:, :3], quota, mask)
        return points[idx, :3]

    kp = jax.vmap(per_sector)(jnp.arange(num_sectors))       # (S, quota, 3)
    return kp.reshape(-1, 3)


def sample_points_with_roi(points: jnp.ndarray, valid: jnp.ndarray,
                           rois: jnp.ndarray, roi_valid: jnp.ndarray,
                           sample_radius: float) -> jnp.ndarray:
    """Mask points farther than (roi radius + sample_radius) from every RoI
    center (voxel_set_abstraction.sample_points_with_roi:20-57)."""
    d2 = jnp.sum((points[:, None, :3] - rois[None, :, :3]) ** 2, -1)
    roi_r = jnp.linalg.norm(rois[:, 3:6], axis=-1) / 2.0 + sample_radius
    near = (d2 <= (roi_r ** 2)[None, :]) & roi_valid[None, :]
    return valid & near.any(axis=1)


class PVRCNNPlusPlusDetector(nn.Module):
    """pv_rcnn_plusplus.py topology: RPN -> proposals -> SPC keypoints ->
    VectorPool VSA -> VectorPool RoI grid pooling -> refinement."""
    cfg: DetectorConfig
    roi_cfg: RoIHeadConfig = RoIHeadConfig()
    pp_cfg: PVPPConfig = PVPPConfig()

    @nn.compact
    def __call__(self, batch: DetBatch, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        c, pp = self.cfg, self.pp_cfg
        assert batch.points is not None, "PV-RCNN++ needs raw points"
        bev2d, ms = VoxelDenseTrunk(c, name="trunk")(batch, train)
        aset = anchor_set_for(c)
        rpn = AnchorHeadSingle(c.head, aset.num_per_loc,
                               _coder(c).full_code_size,
                               name="dense_head")(bev2d)
        rng = self.make_rng("sampler") if train else None
        stage1 = _stage1_proposals(c, self.roi_cfg, rpn, batch, train, rng)

        # sectorized proposal-centric keypoints
        def keypoints_item(pts, pv, rois, rv):
            near = sample_points_with_roi(pts, pv, rois, rv,
                                          pp.sample_radius_with_roi)
            # fall back to all valid points when nothing is near a proposal
            use = jnp.where(near.any(), near, pv)
            return sector_fps(pts, use, pp.num_keypoints, pp.num_sectors)

        keypoints = jax.vmap(keypoints_item)(
            batch.points[..., :3], batch.point_valid,
            jax.lax.stop_gradient(stage1["rois"]), stage1["roi_valid"])

        # VectorPool VSA over raw points + sparse scales + BEV
        feats = []
        pf = batch.points[..., 3:] if batch.points.shape[-1] > 3 \
            else jnp.zeros(batch.points.shape[:2] + (1,), jnp.float32)
        for i, r in enumerate(pp.vp_radii):
            agg = VectorPoolLocalAgg(pp.vp_mlp, r, pp.vp_grid_size,
                                     name=f"vp_raw_{i}")
            feats.append(jax.vmap(agg)(batch.points[..., :3], pf,
                                       batch.point_valid, keypoints))
        for src, stride, r in pp.vsa_sources:
            st = ms[src]
            centers = jax.vmap(lambda cz: get_voxel_centers(
                cz, stride, c.voxel_size, c.point_cloud_range))(st.coords)
            agg = VectorPoolLocalAgg(pp.vp_mlp, r, pp.vp_grid_size,
                                     name=f"vp_{src}")
            feats.append(jax.vmap(agg)(centers, st.features, st.valid,
                                       keypoints))
        if pp.use_bev:
            x_idx = (keypoints[..., 0] - c.point_cloud_range[0]) \
                / (c.voxel_size[0] * pp.bev_stride)
            y_idx = (keypoints[..., 1] - c.point_cloud_range[1]) \
                / (c.voxel_size[1] * pp.bev_stride)
            feats.append(jax.vmap(bilinear_interpolate_bev)(bev2d, x_idx,
                                                            y_idx))
        raw = jnp.concatenate(feats, -1)
        kp_feats = nn.Dense(pp.num_output_features, use_bias=False,
                            name="fusion")(raw)
        kp_feats = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                                name="fusion_bn")(kp_feats)
        kp_feats = nn.relu(kp_feats)

        ph = PointHeadSimple(PointHeadConfig(num_class=1, class_agnostic=True),
                             name="point_head")(raw, train)
        kp_feats = kp_feats \
            * jax.lax.stop_gradient(ph["point_cls_scores"])[..., None]

        # RoI grid pooling via VectorPool around grid points
        g3 = self.roi_cfg.grid_size ** 3
        b, r_ = stage1["rois"].shape[:2]
        grid = jax.vmap(lambda ro: roi_grid_points(
            ro, self.roi_cfg.grid_size))(stage1["rois"])
        agg = VectorPoolLocalAgg(pp.vp_mlp * 2, self.roi_cfg.pool_radii[-1],
                                 pp.vp_grid_size, name="vp_roi")
        pooled = jax.vmap(agg)(keypoints, kp_feats,
                               jnp.ones(keypoints.shape[:2], bool),
                               grid.reshape(b, r_ * g3, 3))
        pooled = pooled.reshape(b, r_, -1)
        rcnn_cls, rcnn_reg = RefinementMLP(self.roi_cfg, name="rcnn_head")(
            pooled, stage1["roi_valid"], train)
        return {"rpn": rpn, "rcnn_cls": rcnn_cls, "rcnn_reg": rcnn_reg,
                "point_cls_preds": ph["point_cls_preds"],
                "keypoints": keypoints, **stage1}

    def loss(self, preds, batch: DetBatch):
        losses = _two_stage_loss(self.cfg, self.roi_cfg, preds, batch)
        labels, _, _ = jax.vmap(functools.partial(
            assign_point_targets, extra_width=(0.2, 0.2, 0.2)))(
            preds["keypoints"],
            jnp.ones(preds["keypoints"].shape[:2], bool),
            batch.gt_boxes, batch.gt_classes, batch.gt_valid)
        losses["point_loss_cls"] = point_cls_loss(
            preds["point_cls_preds"], labels, 1)
        losses["loss"] = losses["loss"] + losses["point_loss_cls"]
        return losses

    def predict(self, preds):
        return _two_stage_predict(self.cfg, preds)


@register_detector("PVRCNNPlusPlus")
@register_detector("PV-RCNN++")
def _build_pvrcnn_pp(cfg):
    return PVRCNNPlusPlusDetector(cfg)
