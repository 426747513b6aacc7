"""Point-wise heads: foreground segmentation and point-based box regression.

Capability parity with pcdet/models/dense_heads/point_head_simple.py:10-91
(PV-RCNN's keypoint-weighting head), point_head_box.py:9-115 (PointRCNN's
first stage), and the target assignment of point_head_template.py:35-109
(points-in-enlarged-GT labeling with an ignore ring).

TPU-native design: targets are computed with ops/boxes3d.points_in_boxes on
fixed-shape padded point sets; losses are pure functions; the heads are plain
MLP stacks (the reference's Conv1d(k=1) == Dense).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import boxes3d
from ..train import loss_lib
from .box_coders import PointResidualCoder


@dataclasses.dataclass(frozen=True)
class PointHeadConfig:
    cls_fc: Tuple[int, ...] = (256, 256)
    reg_fc: Tuple[int, ...] = (256, 256)
    num_class: int = 3
    class_agnostic: bool = False           # PointHeadSimple uses 1 logit
    gt_extra_width: Tuple[float, float, float] = (0.2, 0.2, 0.2)
    cls_weight: float = 1.0
    reg_weight: float = 1.0


def _mlp(x, widths, name, train):
    for i, w in enumerate(widths):
        x = nn.Dense(w, use_bias=False, name=f"{name}_{i}")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         name=f"{name}_{i}_bn")(x)
        x = nn.relu(x)
    return x


class PointHeadSimple(nn.Module):
    """Per-point foreground classifier (point_head_simple.py:10-91)."""
    cfg: PointHeadConfig

    @nn.compact
    def __call__(self, point_features: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        out_ch = 1 if self.cfg.class_agnostic else self.cfg.num_class
        h = _mlp(point_features, self.cfg.cls_fc, "cls_fc", train)
        logits = nn.Dense(out_ch, name="cls_out")(h)
        return {"point_cls_preds": logits,
                "point_cls_scores": jax.nn.sigmoid(logits).max(-1)}


class PointHeadBox(nn.Module):
    """Per-point cls + box regression (point_head_box.py:9-115)."""
    cfg: PointHeadConfig
    coder: PointResidualCoder = PointResidualCoder()

    @nn.compact
    def __call__(self, point_features: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        hc = _mlp(point_features, self.cfg.cls_fc, "cls_fc", train)
        hb = _mlp(point_features, self.cfg.reg_fc, "reg_fc", train)
        cls = nn.Dense(self.cfg.num_class, name="cls_out")(hc)
        box = nn.Dense(self.coder.code_size, name="box_out",
                       kernel_init=nn.initializers.normal(0.001))(hb)
        return {"point_cls_preds": cls, "point_box_preds": box,
                "point_cls_scores": jax.nn.sigmoid(cls).max(-1)}


def assign_point_targets(points_xyz: jnp.ndarray, point_valid: jnp.ndarray,
                         gt_boxes: jnp.ndarray, gt_classes: jnp.ndarray,
                         gt_valid: jnp.ndarray,
                         extra_width=(0.2, 0.2, 0.2)):
    """Point labels: class of the containing GT, -1 in the enlarged-box
    ignore ring, else 0 (point_head_template.assign_stack_targets:35-109).
    One item; vmap over batch.

    Returns (labels (N,), box_of_point (N, 7), gt_idx (N,)).
    """
    inside = boxes3d.points_in_boxes(points_xyz, gt_boxes)        # (N, G)
    inside = inside & gt_valid[None, :]
    enlarged = boxes3d.enlarge_box3d(gt_boxes, extra_width)
    in_ring = boxes3d.points_in_boxes(points_xyz, enlarged) \
        & gt_valid[None, :]
    gt_idx = jnp.argmax(inside, axis=1)
    any_in = inside.any(axis=1)
    any_ring = in_ring.any(axis=1)
    labels = jnp.where(any_in, gt_classes[gt_idx],
                       jnp.where(any_ring, -1, 0))
    labels = jnp.where(point_valid, labels, -1)
    return labels, gt_boxes[gt_idx], gt_idx


def point_cls_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                   num_class: int, cls_weight: float = 1.0) -> jnp.ndarray:
    """Focal point-cls loss over cared points (point_head_template:111-142)."""
    cared = labels >= 0
    pos = labels > 0
    one_hot = jax.nn.one_hot(jnp.where(cared, labels, 0), num_class + 1)
    one_hot = one_hot[..., 1:]
    if logits.shape[-1] == 1:                   # class-agnostic
        one_hot = pos[..., None].astype(logits.dtype)
    w = cared.astype(jnp.float32)
    w = w / jnp.maximum(pos.sum(-1, keepdims=True).astype(jnp.float32), 1.0)
    return loss_lib.sigmoid_focal_loss(logits, one_hot, w).sum() \
        / logits.shape[0] * cls_weight


def point_box_loss(coder: PointResidualCoder, box_preds: jnp.ndarray,
                   points_xyz: jnp.ndarray, labels: jnp.ndarray,
                   gt_of_points: jnp.ndarray, reg_weight: float = 1.0
                   ) -> jnp.ndarray:
    """Smooth-L1 on PointResidualCoder targets for foreground points
    (point_head_box.get_loss + template:144-168)."""
    fg = (labels > 0)
    targets = coder.encode(gt_of_points, points_xyz,
                           jnp.maximum(labels, 1))
    w = fg.astype(jnp.float32)
    w = w / jnp.maximum(w.sum(-1, keepdims=True), 1.0)
    l1 = loss_lib.smooth_l1_loss(box_preds, targets, w)
    return l1.sum() / box_preds.shape[0] * reg_weight
