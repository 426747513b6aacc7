"""Part-A2: UNet part segmentation + RoI-aware part aggregation.

Capability parity with pcdet/models/detectors/PartA2_net.py,
dense_heads/point_intra_part_head.py (per-voxel foreground seg + intra-object
part-location regression) and roi_heads/partA2_head.py (RoI-aware avg/max
pooling of part + seg features into 14^3 grids, conv stacks, cls/reg).

TPU-native design: part/seg predictions live on the UNet's stride-1 padded
voxel set; part targets are the canonical in-box position in [0,1]^3 computed
with rotate_points_along_z; RoI-aware pooling is ops/boxes3d.roiaware_pool3d
under a batch vmap; the reference's sparse conv stacks over the pooled grids
become dense 3D convs (the grids are dense fixed-shape tensors here).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import boxes3d
from ..ops.geometry import rotate_points_along_z
from ..ops.voxel import get_voxel_centers
from ..train import loss_lib
from .dense_heads import AnchorHeadSingle
from .detectors import (DetBatch, DetectorConfig, SparseOutConv,
                        anchor_set_for, register_detector, _coder)
from .bev import BaseBEVBackbone, sparse_to_dense_bev
from .point_heads import assign_point_targets
from .roi_detectors import (RefinementMLP, RoIHeadConfig, _stage1_proposals,
                            _two_stage_loss, _two_stage_predict)
from .sparse_backbones import UNetV2
from ..models.sparse_backbone import SparseTensor
from .vfe import mean_vfe


@dataclasses.dataclass(frozen=True)
class PartA2Config:
    pool_size: int = 12                  # reference uses 14; 12 keeps it light
    part_conv_channels: Tuple[int, ...] = (64, 64)
    seg_conv_channels: Tuple[int, ...] = (64, 64)


class PartA2Detector(nn.Module):
    """PartA2_net.py topology: UNetV2 -> {point part head, RPN} -> RoI-aware
    part pooling -> refinement."""
    cfg: DetectorConfig
    roi_cfg: RoIHeadConfig = RoIHeadConfig()
    part_cfg: PartA2Config = PartA2Config()

    @nn.compact
    def __call__(self, batch: DetBatch, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        feats = mean_vfe(batch.voxels, batch.voxel_num_points)
        feats = feats * batch.voxel_valid[..., None].astype(feats.dtype)
        st = SparseTensor(features=feats, coords=batch.voxel_coords,
                          valid=batch.voxel_valid,
                          spatial_shape=c.sparse_shape)
        x_up1, ms = UNetV2(c.max_voxels_per_stage, c.compute_dtype,
                           name="backbone_3d")(st, train, batch.rulebook)

        # point-wise intra-part head (point_intra_part_head.py)
        seg_logits = nn.Dense(1, name="seg_out")(x_up1.features)[..., 0]
        part_reg = jax.nn.sigmoid(
            nn.Dense(3, name="part_out")(x_up1.features))

        # RPN on the encoder's BEV
        out = SparseOutConv(128, max_out_voxels=c.max_voxels_per_stage[3],
                            dtype=c.compute_dtype,
                            name="conv_out")(ms["x_conv4"], train)
        bev = sparse_to_dense_bev(out)
        bev2d = BaseBEVBackbone(
            c.bev_layer_nums, c.bev_layer_strides, c.bev_num_filters,
            c.bev_upsample_strides, c.bev_num_upsample_filters,
            name="backbone_2d")(bev.astype(c.compute_dtype), train)
        aset = anchor_set_for(c)
        rpn = AnchorHeadSingle(c.head, aset.num_per_loc,
                               _coder(c).full_code_size,
                               name="dense_head")(bev2d.astype(jnp.float32))

        rng = self.make_rng("sampler") if train else None
        stage1 = _stage1_proposals(c, self.roi_cfg, rpn, batch, train, rng)

        # RoI-aware pooling (partA2_head.roiaware_pool3d: part avg, seg max)
        centers = jax.vmap(lambda cz: get_voxel_centers(
            cz, 1, c.voxel_size, c.point_cloud_range))(x_up1.coords)
        seg_score = jax.lax.stop_gradient(jax.nn.sigmoid(seg_logits))
        part_feat = jnp.concatenate(
            [jax.lax.stop_gradient(part_reg), seg_score[..., None]], -1)
        g = self.part_cfg.pool_size

        def pool_item(ctr, pf, sf, valid, rois):
            ctr = jnp.where(valid[:, None], ctr, 1e6)   # park invalid voxels
            part = boxes3d.roiaware_pool3d(ctr, pf, rois, g, "avg")
            seg = boxes3d.roiaware_pool3d(ctr, sf, rois, g, "max")
            return part, seg

        part_p, seg_p = jax.vmap(pool_item)(
            centers, part_feat, x_up1.features, x_up1.valid, stage1["rois"])
        b, r = stage1["rois"].shape[:2]

        def conv_stack(x, chans, name):
            for i, ch in enumerate(chans):
                x = nn.Conv(ch, (3, 3, 3), use_bias=False,
                            name=f"{name}_{i}")(x)
                x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                                 name=f"{name}_{i}_bn")(x)
                x = nn.relu(x)
                if i == 0:
                    x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
            return x

        part_h = conv_stack(part_p.reshape((b * r, g, g, g, -1)),
                            self.part_cfg.part_conv_channels, "part_conv")
        seg_h = conv_stack(seg_p.reshape((b * r, g, g, g, -1)),
                           self.part_cfg.seg_conv_channels, "seg_conv")
        merged = jnp.concatenate([part_h, seg_h], -1).reshape(b, r, -1)
        rcnn_cls, rcnn_reg = RefinementMLP(self.roi_cfg, name="rcnn_head")(
            merged, stage1["roi_valid"], train)
        return {"rpn": rpn, "rcnn_cls": rcnn_cls, "rcnn_reg": rcnn_reg,
                "seg_logits": seg_logits, "part_reg": part_reg,
                "voxel_centers": centers, "voxel_valid": x_up1.valid,
                **stage1}

    def loss(self, preds, batch: DetBatch) -> Dict[str, jnp.ndarray]:
        losses = _two_stage_loss(self.cfg, self.roi_cfg, preds, batch)
        # seg + part targets on stride-1 voxel centers
        labels, gt_of, _ = jax.vmap(functools.partial(
            assign_point_targets, extra_width=(0.2, 0.2, 0.2)))(
            preds["voxel_centers"], preds["voxel_valid"], batch.gt_boxes,
            batch.gt_classes, batch.gt_valid)
        fg = (labels > 0)
        one = fg.astype(jnp.float32)
        w = (labels >= 0).astype(jnp.float32)
        w = w / jnp.maximum(fg.sum(-1, keepdims=True).astype(jnp.float32), 1.)
        seg_loss = loss_lib.sigmoid_focal_loss(
            preds["seg_logits"][..., None], one[..., None], w).sum() \
            / labels.shape[0]
        # intra-part targets: canonical in-box position in [0, 1]^3
        local = jax.vmap(lambda ctr, gt: rotate_points_along_z(
            (ctr - gt[:, :3])[:, None], -gt[:, 6])[:, 0])(
            preds["voxel_centers"], gt_of)
        part_t = jnp.clip(local / jnp.maximum(gt_of[..., 3:6], 1e-5) + 0.5,
                          0.0, 1.0)
        bce = -(part_t * jnp.log(jnp.clip(preds["part_reg"], 1e-7, 1.0))
                + (1 - part_t) * jnp.log(jnp.clip(1 - preds["part_reg"],
                                                  1e-7, 1.0)))
        part_loss = (bce.sum(-1) * fg).sum() \
            / jnp.maximum(fg.sum().astype(jnp.float32), 1.0)
        losses["point_loss_seg"] = seg_loss
        losses["point_loss_part"] = part_loss
        losses["loss"] = losses["loss"] + seg_loss + part_loss
        return losses

    def predict(self, preds):
        return _two_stage_predict(self.cfg, preds)


@register_detector("PartA2Net")
@register_detector("PartA2")
def _build_parta2(cfg):
    return PartA2Detector(cfg)
