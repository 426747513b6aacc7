"""Two-stage detectors: VoxelRCNN (detection mode), PV-RCNN, SECOND-IoU.

Capability parity with pcdet/models/detectors/{voxel_rcnn,pv_rcnn,
second_net_iou}.py and their RoI heads (roi_heads/{voxelrcnn_head,
pvrcnn_head,second_head}.py): a dense anchor RPN proposes boxes, proposals
are NMS-selected, sampled against GT during training, pooled (multi-scale
voxel neighborhoods / keypoint set abstraction / rotated BEV grid), and
refined by shared-FC cls+reg branches.

TPU-native design: proposals, sampling and pooling are fixed-shape
(roi_heads.py); the RoI sampler's randomness comes from a flax 'sampler' RNG
stream so the whole train step stays one jit. Stage-1 outputs feeding the
RoI path go through stop_gradient, matching the reference's @torch.no_grad
proposal/target layers (roi_head_template.py:45,106).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import (LiDARBackboneConfig, PointCloudConfig,
                      VoxelizationConfig)
from ..models.roi_grid_pool import ROIGridPool
from .box_coders import ResidualCoder
from .dense_heads import AnchorHeadSingle, anchor_head_loss, decode_anchor_preds
from .detectors import (DetBatch, DetectorConfig, VoxelDenseTrunk,
                        anchor_set_for, register_detector, _coder)
from .pfe import StackSAModuleMSG, VoxelSetAbstraction, VSAConfig, \
    bilinear_interpolate_bev
from .point_heads import (PointHeadConfig, PointHeadSimple,
                          assign_point_targets, point_cls_loss)
from .post import NMSConfig, post_processing
from .roi_heads import (RoISamplerConfig, canonical_gt_transform,
                        decode_roi_boxes, proposal_layer, roi_box_loss,
                        roi_cls_loss, roi_grid_points, sample_rois_for_rcnn)


@dataclasses.dataclass(frozen=True)
class RoIHeadConfig:
    num_rois_train: int = 128            # post-sampling RoIs per image
    shared_fc: Tuple[int, ...] = (256, 256)
    cls_fc: Tuple[int, ...] = (256, 256)
    reg_fc: Tuple[int, ...] = (256, 256)
    dp_ratio: float = 0.3
    grid_size: int = 6
    sampler: RoISamplerConfig = RoISamplerConfig()
    train_nms: NMSConfig = NMSConfig(nms_thresh=0.8, nms_pre_maxsize=512,
                                     nms_post_maxsize=128, score_thresh=0.0)
    test_nms: NMSConfig = NMSConfig(nms_thresh=0.7, nms_pre_maxsize=256,
                                    nms_post_maxsize=100, score_thresh=0.0)
    rcnn_cls_weight: float = 1.0
    rcnn_reg_weight: float = 1.0
    rcnn_corner_weight: float = 1.0
    use_corner_loss: bool = True
    # PV-RCNN keypoint pooling
    pool_radii: Tuple[float, ...] = (0.8, 1.6)
    pool_nsamples: Tuple[int, ...] = (16, 16)
    pool_mlps: Tuple[Tuple[int, ...], ...] = ((64, 64), (64, 64))
    # SECOND-IoU BEV pooling
    bev_grid_size: int = 7
    bev_downsample: int = 8


class RefinementMLP(nn.Module):
    """shared FC + cls/reg branches (roi_head_template.make_fc_layers:29-43,
    pvrcnn_head.py:20-42). Input (B, R, C); masked rows stay zero."""
    cfg: RoIHeadConfig
    num_class: int = 1
    code_size: int = 7
    iou_head: bool = False           # SECOND-IoU: single IoU output, no reg

    @nn.compact
    def __call__(self, x: jnp.ndarray, roi_valid: jnp.ndarray,
                 train: bool = False):
        def fc_stack(h, widths, name, dropout_first=False):
            for k, w in enumerate(widths):
                h = nn.Dense(w, use_bias=False,
                             kernel_init=nn.initializers.xavier_normal(),
                             name=f"{name}_{k}")(h)
                h = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                                 name=f"{name}_{k}_bn")(
                    h, mask=jnp.broadcast_to(roi_valid[..., None], h.shape)
                    if train else None)
                h = nn.relu(h)
                dp = (k == 0) if dropout_first else \
                    (k != len(widths) - 1)
                if self.cfg.dp_ratio > 0 and dp:
                    h = nn.Dropout(self.cfg.dp_ratio,
                                   deterministic=not train)(h)
            return h

        shared = fc_stack(x, self.cfg.shared_fc, "shared_fc")
        hc = fc_stack(shared, self.cfg.cls_fc, "cls_fc", dropout_first=True)
        rcnn_cls = nn.Dense(self.num_class, name="cls_out")(hc)
        if self.iou_head:
            return rcnn_cls[..., 0], None
        hr = fc_stack(shared, self.cfg.reg_fc, "reg_fc", dropout_first=True)
        rcnn_reg = nn.Dense(self.code_size, name="reg_out",
                            kernel_init=nn.initializers.normal(0.001))(hr)
        m = roi_valid[..., None].astype(rcnn_reg.dtype)
        return rcnn_cls[..., 0] * m[..., 0], rcnn_reg * m


def _stage1_proposals(cfg: DetectorConfig, roi_cfg: RoIHeadConfig, preds,
                      batch: DetBatch, train: bool, rng):
    """decode RPN -> NMS proposals -> (train) sampled RoIs + targets."""
    cls, boxes = decode_anchor_preds(preds, anchor_set_for(cfg), _coder(cfg),
                                     cfg.head)
    cls = jax.lax.stop_gradient(cls)
    boxes = jax.lax.stop_gradient(boxes)
    nms_cfg = roi_cfg.train_nms if train else roi_cfg.test_nms
    rois, roi_scores, roi_labels, roi_valid = proposal_layer(cls, boxes,
                                                             nms_cfg)
    out = {"rois": rois, "roi_scores": roi_scores, "roi_labels": roi_labels,
           "roi_valid": roi_valid}
    if train:
        rngs = jax.random.split(rng, rois.shape[0])
        sampled = jax.vmap(functools.partial(sample_rois_for_rcnn,
                                             cfg=roi_cfg.sampler))(
            rngs, rois=rois, roi_scores=roi_scores, roi_labels=roi_labels,
            roi_valid=roi_valid, gt_boxes=batch.gt_boxes,
            gt_classes=batch.gt_classes, gt_valid=batch.gt_valid)
        gt_ct = jax.vmap(canonical_gt_transform)(sampled["rois"],
                                                 sampled["gt_of_rois"])
        out.update(sampled)
        out["gt_of_rois_ct"] = gt_ct
        out["rois"] = sampled["rois"]
        out["roi_valid"] = sampled["roi_valid"]
        out["roi_labels"] = sampled["roi_labels"]
    return out


def _two_stage_loss(cfg: DetectorConfig, roi_cfg: RoIHeadConfig, preds,
                    batch: DetBatch) -> Dict[str, jnp.ndarray]:
    losses = anchor_head_loss(preds["rpn"], anchor_set_for(cfg), _coder(cfg),
                              cfg.head, batch.gt_boxes, batch.gt_classes,
                              batch.gt_valid)
    coder = ResidualCoder()
    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    cls_loss = roi_cls_loss(flat(preds["rcnn_cls"]),
                            flat(preds["rcnn_cls_labels"]),
                            roi_cfg.rcnn_cls_weight)
    reg = roi_box_loss(coder, flat(preds["rcnn_reg"]), flat(preds["rois"]),
                       flat(preds["gt_of_rois_ct"]),
                       flat(preds["gt_of_rois"]),
                       flat(preds["reg_valid_mask"]),
                       roi_cfg.rcnn_corner_weight, roi_cfg.rcnn_reg_weight,
                       roi_cfg.use_corner_loss)
    losses["rcnn_loss_cls"] = cls_loss
    losses.update({k: v for k, v in reg.items() if k != "rcnn_loss_reg_total"})
    losses["loss"] = losses["rpn_loss"] + cls_loss \
        + reg["rcnn_loss_reg_total"]
    return losses


def _two_stage_predict(cfg: DetectorConfig, preds) -> Dict[str, jnp.ndarray]:
    """Refined boxes + class-agnostic NMS (detector3d_template post path with
    has_class_labels=True: labels come from the RoIs)."""
    coder = ResidualCoder()
    b, r = preds["rcnn_cls"].shape
    boxes = jax.vmap(lambda reg, roi: decode_roi_boxes(coder, reg, roi))(
        preds["rcnn_reg"], preds["rois"])
    scores = jax.nn.sigmoid(preds["rcnn_cls"]) \
        * preds["roi_valid"].astype(jnp.float32)
    # has_class_labels path: the rcnn score is class-agnostic, the class
    # comes from each RoI and rides through the NMS selection
    return post_processing(scores[..., None], boxes, cfg.nms,
                           cls_preds_normalized=True,
                           valid=preds["roi_valid"],
                           labels=preds["roi_labels"])


class VoxelRCNNDetector(nn.Module):
    """VoxelRCNN in full detection mode (voxel_rcnn.py + voxelrcnn_head.py
    WITHOUT the reference's GT-RoI modification): RPN proposals are refined
    by multi-scale voxel-neighborhood grid pooling (reusing the MGAR path's
    ROIGridPool, models/roi_grid_pool.py)."""
    cfg: DetectorConfig
    roi_cfg: RoIHeadConfig = RoIHeadConfig()

    @nn.compact
    def __call__(self, batch: DetBatch, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        bev2d, ms = VoxelDenseTrunk(c, name="trunk")(batch, train)
        aset = anchor_set_for(c)
        rpn = AnchorHeadSingle(c.head, aset.num_per_loc,
                               _coder(c).full_code_size,
                               name="dense_head")(bev2d)
        rng = self.make_rng("sampler") if train else None
        stage1 = _stage1_proposals(c, self.roi_cfg, rpn, batch, train, rng)

        pc = PointCloudConfig(
            range=c.point_cloud_range,
            voxel=VoxelizationConfig(voxel_size=c.voxel_size))
        lidar_cfg = LiDARBackboneConfig(
            grid_pool_size=self.roi_cfg.grid_size,
            shared_fc=self.roi_cfg.shared_fc,
            dp_ratio=self.roi_cfg.dp_ratio,
            max_voxels_per_stage=c.max_voxels_per_stage)
        pooled, _ = ROIGridPool(lidar_cfg, pc, name="roi_grid_pool")(
            ms, stage1["rois"], stage1["roi_valid"], train,
            compute_shared_fc=False)
        b, r = stage1["rois"].shape[:2]
        rcnn_cls, rcnn_reg = RefinementMLP(self.roi_cfg, name="rcnn_head")(
            pooled.reshape(b, r, -1), stage1["roi_valid"], train)
        return {"rpn": rpn, "rcnn_cls": rcnn_cls, "rcnn_reg": rcnn_reg,
                **stage1}

    def loss(self, preds, batch: DetBatch):
        return _two_stage_loss(self.cfg, self.roi_cfg, preds, batch)

    def predict(self, preds):
        return _two_stage_predict(self.cfg, preds)


class PVRCNNDetector(nn.Module):
    """PV-RCNN (pv_rcnn.py): voxel trunk + VoxelSetAbstraction keypoints +
    PointHeadSimple keypoint weighting + keypoint-set RoI grid pooling
    (pvrcnn_head.py:64-109)."""
    cfg: DetectorConfig
    roi_cfg: RoIHeadConfig = RoIHeadConfig()
    vsa_cfg: VSAConfig = VSAConfig()

    @nn.compact
    def __call__(self, batch: DetBatch, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        bev2d, ms = VoxelDenseTrunk(c, name="trunk")(batch, train)
        aset = anchor_set_for(c)
        rpn = AnchorHeadSingle(c.head, aset.num_per_loc,
                               _coder(c).full_code_size,
                               name="dense_head")(bev2d)
        assert batch.points is not None, "PV-RCNN needs raw points"
        vsa = VoxelSetAbstraction(self.vsa_cfg, c.voxel_size,
                                  c.point_cloud_range, name="pfe")(
            batch.points, batch.point_valid, ms, bev2d, train)
        ph = PointHeadSimple(
            PointHeadConfig(num_class=1, class_agnostic=True),
            name="point_head")(vsa["features_before_fusion"], train)

        rng = self.make_rng("sampler") if train else None
        stage1 = _stage1_proposals(c, self.roi_cfg, rpn, batch, train, rng)

        # keypoint features weighted by foreground score (pvrcnn_head.py:82)
        kp_feats = vsa["features"] \
            * jax.lax.stop_gradient(ph["point_cls_scores"])[..., None]

        g3 = self.roi_cfg.grid_size ** 3
        b, r = stage1["rois"].shape[:2]
        grid = jax.vmap(lambda ro: roi_grid_points(
            ro, self.roi_cfg.grid_size))(stage1["rois"])   # (B, R, G3, 3)
        sa = StackSAModuleMSG(self.roi_cfg.pool_radii,
                              self.roi_cfg.pool_nsamples,
                              self.roi_cfg.pool_mlps, name="roi_grid_pool")
        pooled = jax.vmap(lambda a, b2, c2: sa(a, b2, c2, train=train))(
            vsa["keypoints"], kp_feats,
            grid.reshape(b, r * g3, 3))                     # (B, R*G3, C)
        pooled = pooled.reshape(b, r, -1)
        rcnn_cls, rcnn_reg = RefinementMLP(self.roi_cfg, name="rcnn_head")(
            pooled, stage1["roi_valid"], train)
        return {"rpn": rpn, "rcnn_cls": rcnn_cls, "rcnn_reg": rcnn_reg,
                "point_cls_preds": ph["point_cls_preds"],
                "keypoints": vsa["keypoints"], **stage1}

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


class SECONDIoUDetector(nn.Module):
    """SECOND-IoU (second_net_iou.py + second_head.py): SECOND RPN + a BEV
    rotated-grid IoU head; at inference the IoU prediction recalibrates the
    classification score (second_net_iou.py's score fusion)."""
    cfg: DetectorConfig
    roi_cfg: RoIHeadConfig = RoIHeadConfig(use_corner_loss=False)

    @nn.compact
    def __call__(self, batch: DetBatch, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        bev2d, ms = VoxelDenseTrunk(c, name="trunk")(batch, train)
        aset = anchor_set_for(c)
        rpn = AnchorHeadSingle(c.head, aset.num_per_loc,
                               _coder(c).full_code_size,
                               name="dense_head")(bev2d)
        rng = self.make_rng("sampler") if train else None
        stage1 = _stage1_proposals(c, self.roi_cfg, rpn, batch, train, rng)

        # rotated BEV grid pooling (second_head.roi_grid_pool:63-118):
        # G x G grid points in the rotated RoI footprint, bilinear-sampled
        g = self.roi_cfg.bev_grid_size
        ds = self.roi_cfg.bev_downsample
        vx = c.voxel_size[0] * ds
        vy = c.voxel_size[1] * ds

        def pool_item(bev, rois):
            u = (jnp.arange(g) + 0.5) / g - 0.5
            gx, gy = jnp.meshgrid(u, u, indexing="ij")
            local = jnp.stack([gx.ravel(), gy.ravel()], -1)     # (G2, 2)
            cosa, sina = jnp.cos(rois[:, 6]), jnp.sin(rois[:, 6])
            lx = local[None, :, 0] * rois[:, None, 3]
            ly = local[None, :, 1] * rois[:, None, 4]
            wx = lx * cosa[:, None] - ly * sina[:, None] + rois[:, None, 0]
            wy = lx * sina[:, None] + ly * cosa[:, None] + rois[:, None, 1]
            fx = (wx - c.point_cloud_range[0]) / vx
            fy = (wy - c.point_cloud_range[1]) / vy
            r = rois.shape[0]
            f = bilinear_interpolate_bev(bev, fx.ravel(), fy.ravel())
            return f.reshape(r, -1)                              # (R, G2*C)

        pooled = jax.vmap(pool_item)(jax.lax.stop_gradient(bev2d),
                                     stage1["rois"])
        rcnn_iou, _ = RefinementMLP(self.roi_cfg, iou_head=True,
                                    name="iou_head")(
            pooled, stage1["roi_valid"], train)
        return {"rpn": rpn, "rcnn_iou": rcnn_iou, **stage1}

    def loss(self, preds, batch: DetBatch):
        losses = anchor_head_loss(preds["rpn"], anchor_set_for(self.cfg),
                                  _coder(self.cfg), self.cfg.head,
                                  batch.gt_boxes, batch.gt_classes,
                                  batch.gt_valid)
        # IoU regression target = actual RoI-GT IoU (second_head targets)
        iou_t = preds["gt_iou_of_rois"] * 2.0 - 1.0     # [0,1] -> [-1,1]
        valid = preds["roi_valid"].astype(jnp.float32)
        l1 = jnp.abs(jnp.tanh(preds["rcnn_iou"]) - iou_t) * valid
        losses["rcnn_loss_iou"] = l1.sum() / jnp.maximum(valid.sum(), 1.0)
        losses["loss"] = losses["rpn_loss"] + losses["rcnn_loss_iou"]
        return losses

    def predict(self, preds):
        """Score recalibration: score = cls^(1-a) * iou^a (second_net_iou.py
        post_processing's SCORE_WEIGHTS idea, a=0.5)."""
        iou = (jnp.tanh(preds["rcnn_iou"]) + 1.0) / 2.0
        score = jnp.sqrt(jnp.clip(preds["roi_scores"], 1e-6) *
                         jnp.clip(iou, 1e-6))
        score = score * preds["roi_valid"].astype(score.dtype)
        return post_processing(score[..., None], preds["rois"], self.cfg.nms,
                               cls_preds_normalized=True,
                               valid=preds["roi_valid"])


@register_detector("VoxelRCNN-Det")
def _build_voxelrcnn_det(cfg):
    return VoxelRCNNDetector(cfg)


@register_detector("PVRCNN")
@register_detector("PV-RCNN")
def _build_pvrcnn(cfg):
    return PVRCNNDetector(cfg)


@register_detector("SECONDNetIoU")
def _build_second_iou(cfg):
    return SECONDIoUDetector(cfg)
