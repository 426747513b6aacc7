"""Dense (BEV) detection heads: anchor-based single head + CenterPoint head.

Capability parity with pcdet/models/dense_heads/:
  - AnchorHeadSingle (anchor_head_single.py:7-75) + the loss/target machinery
    of AnchorHeadTemplate (anchor_head_template.py:101-272): sigmoid-focal
    classification over anchors, smooth-L1 box regression with the
    sin(a-b) angle decomposition, optional direction-bin classifier.
  - CenterHead (center_head.py): per-class heatmaps with gaussian targets,
    center/height/size/angle regression gathered at GT centers.

TPU-native design: heads are Flax modules over NHWC BEV maps; target
assignment (target_assign.py / gaussian_heatmap_targets) is fixed-shape and
vmapped over the batch; losses are pure functions of (preds, targets) so the
whole train step jits.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..train import loss_lib
from .box_coders import ResidualCoder
from .target_assign import AnchorSet, assign_targets


def limit_period(val, offset: float = 0.5, period: float = np.pi):
    """pcdet common_utils.limit_period:55 — wrap angle into one period."""
    return val - jnp.floor(val / period + offset) * period


# ---------------------------------------------------------------------------
# Anchor head
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AnchorHeadConfig:
    num_class: int = 3
    use_direction_classifier: bool = True
    num_dir_bins: int = 2
    dir_offset: float = 0.78539          # pi/4
    dir_limit_offset: float = 0.0
    cls_weight: float = 1.0
    loc_weight: float = 2.0
    dir_weight: float = 0.2
    code_weights: Tuple[float, ...] = (1.0,) * 7
    match_height: bool = False
    norm_by_num_examples: bool = False
    encode_angle_by_sincos: bool = False


class AnchorHeadSingle(nn.Module):
    """1x1-conv anchor head over a BEV map (anchor_head_single.py:41-75).

    Input (B, H, W, C) NHWC; channel layout of the outputs matches the
    interleaved AnchorSet order (class-major per location).
    """
    cfg: AnchorHeadConfig
    num_anchors_per_loc: int
    code_size: int = 7

    @nn.compact
    def __call__(self, bev: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        a, c = self.num_anchors_per_loc, self.cfg
        # focal-init bias pi=0.01 (anchor_head_single.py:36-39)
        cls = nn.Conv(a * c.num_class, (1, 1), name="conv_cls",
                      bias_init=nn.initializers.constant(
                          -float(np.log((1 - 0.01) / 0.01))))(bev)
        box = nn.Conv(a * self.code_size, (1, 1), name="conv_box",
                      kernel_init=nn.initializers.normal(0.001))(bev)
        out = {"cls_preds": cls, "box_preds": box}
        if c.use_direction_classifier:
            out["dir_cls_preds"] = nn.Conv(a * c.num_dir_bins, (1, 1),
                                           name="conv_dir_cls")(bev)
        return out


def _flat(x: jnp.ndarray, last: int) -> jnp.ndarray:
    return x.reshape(x.shape[0], -1, last)


def anchor_head_loss(preds: Dict[str, jnp.ndarray], anchor_set: AnchorSet,
                     coder: ResidualCoder, cfg: AnchorHeadConfig,
                     gt_boxes: jnp.ndarray, gt_classes: jnp.ndarray,
                     gt_valid: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """RPN loss (anchor_head_template.py:101-223): focal cls + smooth-L1 loc
    (+ direction CE). Batched: gt_* are (B, G, ...)."""
    labels, reg_targets, reg_weights = jax.vmap(
        partial(assign_targets, anchor_set, coder,
                match_height=cfg.match_height,
                norm_by_num_examples=cfg.norm_by_num_examples)
    )(gt_boxes, gt_classes, gt_valid)                      # (B,N) (B,N,c) (B,N)

    b = labels.shape[0]
    cls_preds = _flat(preds["cls_preds"], cfg.num_class)
    box_preds = _flat(preds["box_preds"], coder.full_code_size)

    cared = labels >= 0
    positives = labels > 0
    cls_weights = (cared.astype(jnp.float32))
    pos_norm = jnp.maximum(positives.sum(1, keepdims=True), 1.0)
    cls_weights = cls_weights / pos_norm
    reg_w = positives.astype(jnp.float32) / pos_norm

    one_hot = jax.nn.one_hot(jnp.where(cared, labels, 0),
                             cfg.num_class + 1)[..., 1:]
    cls_loss = loss_lib.sigmoid_focal_loss(
        cls_preds, one_hot, cls_weights).sum() / b * cfg.cls_weight

    anchors = jnp.asarray(anchor_set.anchors)
    if not cfg.encode_angle_by_sincos:
        # sin(a - b) decomposition on the heading residual (template:137-144)
        pr, tr = box_preds[..., 6:7], reg_targets[..., 6:7]
        pred_sin = jnp.sin(pr) * jnp.cos(tr)
        targ_sin = jnp.cos(pr) * jnp.sin(tr)
        box_preds_s = jnp.concatenate(
            [box_preds[..., :6], pred_sin, box_preds[..., 7:]], -1)
        reg_targets_s = jnp.concatenate(
            [reg_targets[..., :6], targ_sin, reg_targets[..., 7:]], -1)
    else:
        box_preds_s, reg_targets_s = box_preds, reg_targets
    code_w = jnp.asarray(cfg.code_weights[:box_preds_s.shape[-1]])
    loc = loss_lib.smooth_l1_loss(box_preds_s * code_w, reg_targets_s * code_w,
                                  reg_w)
    loc_loss = loc.sum() / b * cfg.loc_weight
    losses = {"rpn_loss_cls": cls_loss, "rpn_loss_loc": loc_loss}

    if cfg.use_direction_classifier and "dir_cls_preds" in preds:
        rot_gt = reg_targets[..., 6] + anchors[None, :, 6]
        offset_rot = limit_period(rot_gt - cfg.dir_offset, 0, 2 * np.pi)
        dir_t = jnp.clip((offset_rot / (2 * np.pi / cfg.num_dir_bins))
                         .astype(jnp.int32), 0, cfg.num_dir_bins - 1)
        dir_logits = _flat(preds["dir_cls_preds"], cfg.num_dir_bins)
        w = positives.astype(jnp.float32)
        w = w / jnp.maximum(w.sum(-1, keepdims=True), 1.0)
        dir_loss = loss_lib.weighted_cross_entropy(
            dir_logits, jax.nn.one_hot(dir_t, cfg.num_dir_bins), w
        ).sum() / b * cfg.dir_weight
        losses["rpn_loss_dir"] = dir_loss
    losses["rpn_loss"] = sum(losses.values())
    return losses


def decode_anchor_preds(preds: Dict[str, jnp.ndarray], anchor_set: AnchorSet,
                        coder: ResidualCoder, cfg: AnchorHeadConfig
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(batch_cls_preds (B,N,num_class) raw logits, batch_box_preds (B,N,7)) —
    anchor_head_template.generate_predicted_boxes:225-272."""
    anchors = jnp.asarray(anchor_set.anchors)
    cls_preds = _flat(preds["cls_preds"], cfg.num_class)
    box_preds = _flat(preds["box_preds"], coder.full_code_size)
    boxes = coder.decode(box_preds, anchors[None])
    if cfg.use_direction_classifier and "dir_cls_preds" in preds:
        dir_preds = _flat(preds["dir_cls_preds"], cfg.num_dir_bins)
        dir_labels = jnp.argmax(dir_preds, -1)
        period = 2 * np.pi / cfg.num_dir_bins
        dir_rot = limit_period(boxes[..., 6] - cfg.dir_offset,
                               cfg.dir_limit_offset, period)
        heading = dir_rot + cfg.dir_offset + period * dir_labels
        boxes = boxes.at[..., 6].set(heading)
    return cls_preds, boxes


# ---------------------------------------------------------------------------
# CenterPoint head
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CenterHeadConfig:
    class_names: Tuple[str, ...] = ("Car", "Pedestrian", "Cyclist")
    shared_conv_channels: int = 64
    num_hm_conv: int = 2
    feature_map_stride: int = 8
    gaussian_overlap: float = 0.1
    min_radius: int = 2
    cls_weight: float = 1.0
    loc_weight: float = 2.0
    code_weights: Tuple[float, ...] = (1., 1., 1., 1., 1., 1., 1., 1.)
    max_objs: int = 500
    # regression target channels: center(2) center_z(1) dim(3) rot(2)
    head_order: Tuple[str, ...] = ("center", "center_z", "dim", "rot")
    head_dims: Tuple[int, ...] = (2, 1, 3, 2)


class CenterHead(nn.Module):
    """CenterPoint head (center_head.py): shared conv + per-task branches.

    Single task group covering all classes (the common single-head layout).
    Outputs NHWC maps: heatmap (B,H,W,num_class) and regression channels.
    """
    cfg: CenterHeadConfig

    @nn.compact
    def __call__(self, bev: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        x = nn.Conv(c.shared_conv_channels, (3, 3), use_bias=False,
                    name="shared_conv")(bev)
        x = nn.BatchNorm(use_running_average=not train, name="shared_bn")(x)
        x = nn.relu(x)

        def branch(name, out_ch, n_conv, bias_init=0.0):
            h = x
            for i in range(n_conv - 1):
                h = nn.Conv(c.shared_conv_channels, (3, 3),
                            name=f"{name}_conv{i}")(h)
                h = nn.relu(h)
            return nn.Conv(out_ch, (3, 3), name=f"{name}_out",
                           bias_init=nn.initializers.constant(bias_init))(h)

        out = {"hm": branch("hm", len(c.class_names), c.num_hm_conv,
                            bias_init=-2.19)}      # focal init (center_head.py)
        for nm, d in zip(c.head_order, c.head_dims):
            out[nm] = branch(nm, d, 2)
        return out


def gaussian_heatmap_targets(cfg: CenterHeadConfig,
                             grid_size: Tuple[int, int],
                             voxel_size: Sequence[float],
                             pc_range: Sequence[float],
                             gt_boxes: jnp.ndarray, gt_classes: jnp.ndarray,
                             gt_valid: jnp.ndarray):
    """CenterNet targets for one item (vmap over batch) — the fixed-shape
    equivalent of center_head.py assign_target_of_single_head: instead of
    drawing truncated gaussians into the map with dynamic patches, each GT
    contributes a full-map radius-truncated gaussian and the heatmap is the
    max over GTs.

    Returns: heatmap (H, W, C), reg_targets (G, 8), inds (G,) flat y*W+x,
    mask (G,).
    """
    fy = grid_size[1] // cfg.feature_map_stride
    fx = grid_size[0] // cfg.feature_map_stride
    vx = voxel_size[0] * cfg.feature_map_stride
    vy = voxel_size[1] * cfg.feature_map_stride

    cx = (gt_boxes[:, 0] - pc_range[0]) / vx
    cy = (gt_boxes[:, 1] - pc_range[1]) / vy
    xi = jnp.clip(cx.astype(jnp.int32), 0, fx - 1)
    yi = jnp.clip(cy.astype(jnp.int32), 0, fy - 1)
    in_map = (cx >= 0) & (cx < fx) & (cy >= 0) & (cy < fy)
    mask = gt_valid & in_map & (gt_boxes[:, 3] > 0) & (gt_boxes[:, 4] > 0)

    dx = gt_boxes[:, 3] / vx
    dy = gt_boxes[:, 4] / vy
    radius = _gaussian_radius(dy, dx, cfg.gaussian_overlap)
    radius = jnp.maximum(radius.astype(jnp.int32), cfg.min_radius)

    ys = jnp.arange(fy, dtype=jnp.float32)[:, None]
    xs = jnp.arange(fx, dtype=jnp.float32)[None, :]

    def one_gt(xi_, yi_, r, m):
        sigma = (2 * r.astype(jnp.float32) + 1) / 6.0
        d2 = (ys - yi_) ** 2 + (xs - xi_) ** 2
        g = jnp.exp(-d2 / (2 * sigma ** 2))
        trunc = (jnp.abs(ys - yi_) <= r) & (jnp.abs(xs - xi_) <= r)
        return jnp.where(trunc & m, g, 0.0)                  # (H, W)

    gmaps = jax.vmap(one_gt)(xi.astype(jnp.float32), yi.astype(jnp.float32),
                             radius, mask)                   # (G, H, W)
    onehot = jax.nn.one_hot(gt_classes - 1, len(cfg.class_names))  # (G, C)
    heatmap = jnp.max(gmaps[:, :, :, None] * onehot[:, None, None, :], axis=0)

    reg = jnp.concatenate([
        (cx - xi)[:, None], (cy - yi)[:, None],              # sub-pixel center
        gt_boxes[:, 2:3],                                    # center_z
        jnp.log(jnp.maximum(gt_boxes[:, 3:6], 1e-5)),        # dim (log)
        jnp.cos(gt_boxes[:, 6:7]), jnp.sin(gt_boxes[:, 6:7]),
    ], -1)                                                   # (G, 8)
    inds = yi * fx + xi
    return heatmap, reg, inds, mask


def _gaussian_radius(height, width, min_overlap: float):
    """centernet_utils.gaussian_radius — min of the three IoU-bound roots."""
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * a1 * c1, 0.0))) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 + jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0.0))) / 2

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0.0))) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def center_head_loss(preds: Dict[str, jnp.ndarray], cfg: CenterHeadConfig,
                     grid_size, voxel_size, pc_range,
                     gt_boxes: jnp.ndarray, gt_classes: jnp.ndarray,
                     gt_valid: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Heatmap focal + gathered L1 regression (center_head.py get_loss)."""
    hm_t, reg_t, inds, mask = jax.vmap(
        partial(gaussian_heatmap_targets, cfg, tuple(grid_size),
                tuple(voxel_size), tuple(pc_range)))(
        gt_boxes, gt_classes, gt_valid)

    hm_pred = jnp.clip(jax.nn.sigmoid(preds["hm"]), 1e-4, 1 - 1e-4)
    hm_loss = loss_lib.gaussian_focal_loss(hm_pred, hm_t) * cfg.cls_weight

    reg_pred = jnp.concatenate([preds[k] for k in cfg.head_order], -1)
    b, h, w, c = reg_pred.shape
    flat = reg_pred.reshape(b, h * w, c)
    gathered = jnp.take_along_axis(
        flat, inds[..., None].astype(jnp.int32), axis=1)     # (B, G, c)
    code_w = jnp.asarray(cfg.code_weights[:c])
    l1 = jnp.abs(gathered - reg_t) * code_w
    m = mask[..., None].astype(l1.dtype)
    loc_loss = (l1 * m).sum() / jnp.maximum(m.sum(), 1.0) * cfg.loc_weight
    return {"hm_loss": hm_loss, "loc_loss": loc_loss,
            "center_loss": hm_loss + loc_loss}


def decode_center_preds(preds: Dict[str, jnp.ndarray], cfg: CenterHeadConfig,
                        grid_size, voxel_size, pc_range,
                        max_boxes: int = 500
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-K peak decode (centernet_utils.decode_bbox_from_heatmap analogue).

    Returns (scores (B,K), labels (B,K) 1-based, boxes (B,K,7)).
    """
    hm = jax.nn.sigmoid(preds["hm"])                          # (B,H,W,C)
    b, h, w, c = hm.shape
    flat = hm.reshape(b, h * w * c)
    scores, idx = jax.lax.top_k(flat, max_boxes)              # (B,K)
    cls = idx % c
    pix = idx // c
    yi = (pix // w).astype(jnp.float32)
    xi = (pix % w).astype(jnp.float32)

    def gather(name):
        f = preds[name].reshape(b, h * w, -1)
        return jnp.take_along_axis(f, pix[..., None], axis=1)

    center = gather("center")                                 # (B,K,2)
    xs = (xi + center[..., 0]) * voxel_size[0] * cfg.feature_map_stride \
        + pc_range[0]
    ys = (yi + center[..., 1]) * voxel_size[1] * cfg.feature_map_stride \
        + pc_range[1]
    zs = gather("center_z")[..., 0]
    dims = jnp.exp(gather("dim"))
    rot = gather("rot")
    heading = jnp.arctan2(rot[..., 1], rot[..., 0])
    boxes = jnp.concatenate(
        [xs[..., None], ys[..., None], zs[..., None], dims,
         heading[..., None]], -1)
    return scores, cls + 1, boxes
