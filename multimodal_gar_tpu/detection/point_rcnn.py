"""PointRCNN: point-based two-stage detector.

Capability parity with pcdet/models/detectors/point_rcnn.py:4-30 +
roi_heads/pointrcnn_head.py:10-179: PointNet++ backbone over raw points,
PointHeadBox first stage (per-point class + box), RoI-point pooling with
canonical transform, xyz-up/merge-down feature fusion, an SA encoder over the
pooled points, and cls/reg refinement.

TPU-native design: roipoint_pool3d (ops/boxes3d.py) returns fixed-size
first-k in-box points per RoI; the per-RoI SA encoder runs under a double
vmap (batch x roi) with static point counts; empty RoIs are masked.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.geometry import safe_sqrt

from ..ops import boxes3d
from .box_coders import PointResidualCoder, ResidualCoder
from .detectors import DetBatch, DetectorConfig, register_detector
from .point_heads import (PointHeadBox, PointHeadConfig, assign_point_targets,
                          point_box_loss, point_cls_loss)
from .pointnet2 import PointNet2Config, PointNet2MSG, SAModuleMSG, _mlp
from .roi_detectors import (RoIHeadConfig, RefinementMLP,
                            _two_stage_predict)
from .roi_heads import (canonical_gt_transform, proposal_layer,
                        sample_rois_for_rcnn)
from ..ops.geometry import rotate_points_along_z


@dataclasses.dataclass(frozen=True)
class PointRCNNRoIConfig:
    num_sampled_points: int = 512
    depth_normalizer: float = 70.0
    xyz_up_layer: Tuple[int, ...] = (128, 128)
    sa_npoints: Tuple[int, ...] = (128, 32, -1)
    sa_radii: Tuple[float, ...] = (0.2, 0.4, 100.0)
    sa_nsamples: Tuple[int, ...] = (16, 16, 16)
    sa_mlps: Tuple[Tuple[int, ...], ...] = ((128, 128, 128),
                                            (128, 128, 256),
                                            (256, 256, 512))


class PointRCNNDetector(nn.Module):
    """point_rcnn.py topology: PointNet2MSG -> PointHeadBox -> PointRCNNHead."""
    cfg: DetectorConfig
    roi_cfg: RoIHeadConfig = RoIHeadConfig(use_corner_loss=True)
    pn2_cfg: PointNet2Config = PointNet2Config()
    pool_cfg: PointRCNNRoIConfig = PointRCNNRoIConfig()

    @property
    def _point_head_cfg(self) -> PointHeadConfig:
        return PointHeadConfig(num_class=len(self.cfg.class_names))

    @property
    def _coder(self) -> PointResidualCoder:
        return PointResidualCoder()

    @nn.compact
    def __call__(self, batch: DetBatch, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        assert batch.points is not None, "PointRCNN consumes raw points"
        xyz = batch.points[..., :3]
        feats = PointNet2MSG(self.pn2_cfg, name="backbone_3d")(
            batch.points, batch.point_valid, train)
        ph = PointHeadBox(self._point_head_cfg, self._coder,
                          name="point_head")(feats, train)

        # per-point box decode -> proposals (point_head_box.py:82-96)
        pred_cls = ph["point_cls_preds"].argmax(-1) + 1
        point_boxes = self._coder.decode(ph["point_box_preds"], xyz, pred_cls)
        cls_for_nms = jnp.where(batch.point_valid[..., None],
                                ph["point_cls_preds"], -1e4)
        nms_cfg = self.roi_cfg.train_nms if train else self.roi_cfg.test_nms
        rois, roi_scores, roi_labels, roi_valid = proposal_layer(
            jax.lax.stop_gradient(cls_for_nms),
            jax.lax.stop_gradient(point_boxes), nms_cfg)
        stage1 = {"rois": rois, "roi_scores": roi_scores,
                  "roi_labels": roi_labels, "roi_valid": roi_valid}
        if train:
            rngs = jax.random.split(self.make_rng("sampler"), rois.shape[0])
            sampled = jax.vmap(functools.partial(
                sample_rois_for_rcnn, cfg=self.roi_cfg.sampler))(
                rngs, rois=rois, roi_scores=roi_scores,
                roi_labels=roi_labels, roi_valid=roi_valid,
                gt_boxes=batch.gt_boxes, gt_classes=batch.gt_classes,
                gt_valid=batch.gt_valid)
            stage1.update(sampled)
            stage1["gt_of_rois_ct"] = jax.vmap(canonical_gt_transform)(
                sampled["rois"], sampled["gt_of_rois"])

        # RoI-point pooling (pointrcnn_head.roipool3d_gpu:85-140)
        pc = self.pool_cfg
        scores = jax.lax.stop_gradient(ph["point_cls_scores"])
        depth = safe_sqrt(jnp.sum(xyz ** 2, axis=-1)) \
            / pc.depth_normalizer - 0.5
        pfeat = jnp.concatenate(
            [scores[..., None], depth[..., None],
             jax.lax.stop_gradient(feats)], -1)
        pooled, empty = jax.vmap(functools.partial(
            boxes3d.roipoint_pool3d,
            num_sampled_points=pc.num_sampled_points))(
            xyz, pfeat, stage1["rois"])            # (B, R, K, 3+2+C), (B, R)

        # canonical transform of pooled xyz
        b, r, k, _ = pooled.shape
        rois_flat = stage1["rois"].reshape(b * r, 7)
        pooled = pooled.reshape(b * r, k, -1)
        local_xyz = rotate_points_along_z(
            pooled[..., :3] - rois_flat[:, None, :3], -rois_flat[:, 6])
        prefix = jnp.concatenate([local_xyz, pooled[:, :, 3:5]], -1)  # xyz+s+d
        rest = pooled[:, :, 5:]

        up = _mlp(prefix, pc.xyz_up_layer, "xyz_up", train)
        merged = jnp.concatenate([up, rest], -1)
        merged = _mlp(merged, (pc.xyz_up_layer[-1],), "merge_down", train)

        # per-RoI SA encoder (double vmap); npoint=-1 => global pool
        cur_xyz, cur_f = local_xyz, merged
        cur_valid = jnp.broadcast_to((~empty).reshape(b * r, 1), (b * r, k))
        for i, (np_, rad, ns, mlp) in enumerate(zip(
                pc.sa_npoints, pc.sa_radii, pc.sa_nsamples, pc.sa_mlps)):
            if np_ == -1:
                h = _mlp(jnp.concatenate([cur_xyz, cur_f], -1), mlp,
                         f"sa{i}_global", train)
                h = jnp.max(jnp.where(cur_valid[..., None], h, -jnp.inf),
                            axis=1)
                h = jnp.where(jnp.any(cur_valid, 1)[..., None], h, 0.0)
                cur_f = h
                break
            sa = SAModuleMSG(np_, (rad,), (ns,), (mlp,), name=f"sa{i}")
            cur_xyz, cur_f, cur_valid = sa(cur_xyz, cur_f, cur_valid, train)

        roi_feats = cur_f.reshape(b, r, -1)
        rcnn_cls, rcnn_reg = RefinementMLP(self.roi_cfg, name="rcnn_head")(
            roi_feats, stage1["roi_valid"] & ~empty, train)
        return {"point_cls_preds": ph["point_cls_preds"],
                "point_box_preds": ph["point_box_preds"],
                "rcnn_cls": rcnn_cls, "rcnn_reg": rcnn_reg, **stage1}

    def loss(self, preds, batch: DetBatch) -> Dict[str, jnp.ndarray]:
        coder = ResidualCoder()
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        from .roi_heads import roi_box_loss, roi_cls_loss
        losses = {}
        labels, gt_of_pts, _ = jax.vmap(functools.partial(
            assign_point_targets,
            extra_width=self._point_head_cfg.gt_extra_width))(
            batch.points[..., :3], batch.point_valid, batch.gt_boxes,
            batch.gt_classes, batch.gt_valid)
        losses["point_loss_cls"] = point_cls_loss(
            preds["point_cls_preds"], labels,
            self._point_head_cfg.num_class)
        losses["point_loss_box"] = point_box_loss(
            self._coder, preds["point_box_preds"], batch.points[..., :3],
            labels, gt_of_pts)
        losses["rcnn_loss_cls"] = roi_cls_loss(
            flat(preds["rcnn_cls"]), flat(preds["rcnn_cls_labels"]),
            self.roi_cfg.rcnn_cls_weight)
        reg = roi_box_loss(coder, flat(preds["rcnn_reg"]),
                           flat(preds["rois"]), flat(preds["gt_of_rois_ct"]),
                           flat(preds["gt_of_rois"]),
                           flat(preds["reg_valid_mask"]),
                           self.roi_cfg.rcnn_corner_weight,
                           self.roi_cfg.rcnn_reg_weight,
                           self.roi_cfg.use_corner_loss)
        losses.update({k: v for k, v in reg.items()
                       if k != "rcnn_loss_reg_total"})
        losses["loss"] = losses["point_loss_cls"] + losses["point_loss_box"] \
            + losses["rcnn_loss_cls"] + reg["rcnn_loss_reg_total"]
        return losses

    def predict(self, preds) -> Dict[str, jnp.ndarray]:
        return _two_stage_predict(self.cfg, preds)


@register_detector("PointRCNN")
def _build_pointrcnn(cfg):
    return PointRCNNDetector(cfg)
