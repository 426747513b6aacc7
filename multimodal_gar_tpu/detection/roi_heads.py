"""Two-stage RoI refinement: proposals, target sampling, losses, decoding.

Capability parity with pcdet/models/roi_heads/roi_head_template.py:11-261 and
target_assigner/proposal_target_layer.py:8-228:
  - proposal_layer: NMS over stage-1 dense predictions -> fixed RoI set.
  - ProposalTargetLayer: fg/bg-balanced RoI sampling against GT IoU with
    per-class matching, reg/cls label construction (cls | roi_iou modes).
  - canonical-frame GT transform with heading flip, residual-coder targets
    against the (0,0,0,ry=0) local RoI anchor, smooth-L1 + corner loss, BCE
    cls loss, and local->global decode of refined boxes.

TPU-native design: all sampling is fixed-shape. The reference's dynamic
nonzero/permutation subsampling (proposal_target_layer.py:117-192) becomes a
rank-and-top_k scheme: fg candidates get random keys and the top
FG_ROIS_PER_IMAGE survive; background candidates are ordered by interleaving
hard/easy at HARD_BG_RATIO (position i/r for hard, i/(1-r) for easy) and fill
the remaining slots. Sampling is without replacement (the reference samples
bg WITH replacement via randint — a documented deviation that only widens
coverage). Degenerate cases (no fg / no bg) degrade to masked slots instead
of the reference's RuntimeError.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import boxes3d
from ..ops.geometry import rotate_points_along_z
from ..train import loss_lib
from .box_coders import ResidualCoder
from .post import NMSConfig, class_agnostic_nms


@dataclasses.dataclass(frozen=True)
class RoISamplerConfig:
    """TARGET_CONFIG of the RoI heads (pvrcnn/second/voxelrcnn configs)."""
    roi_per_image: int = 128
    fg_ratio: float = 0.5
    sample_roi_by_each_class: bool = True
    cls_score_type: str = "roi_iou"      # cls | roi_iou
    cls_fg_thresh: float = 0.75
    cls_bg_thresh: float = 0.25
    cls_bg_thresh_lo: float = 0.1
    hard_bg_ratio: float = 0.8
    reg_fg_thresh: float = 0.55


def proposal_layer(batch_cls_preds: jnp.ndarray, batch_box_preds: jnp.ndarray,
                   nms_cfg: NMSConfig
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stage-1 proposals (roi_head_template.proposal_layer:46-102).

    Returns (rois (B,K,7), roi_scores (B,K), roi_labels (B,K) 1-based,
    roi_valid (B,K)); K = nms_post_maxsize.
    """
    def per_item(cls, box):
        scores = jax.nn.sigmoid(cls).max(-1)
        labels = cls.argmax(-1).astype(jnp.int32) + 1
        idx, sc, vd = class_agnostic_nms(scores, box[:, :7], nms_cfg)
        return box[idx, :7], sc, labels[idx] * vd.astype(jnp.int32), vd

    return jax.vmap(per_item)(batch_cls_preds, batch_box_preds)


def _max_iou_with_same_class(rois, roi_labels, gt_boxes, gt_classes, gt_valid):
    """(K,) best IoU + gt index, only counting GTs of the RoI's class
    (proposal_target_layer.get_max_iou_with_same_class:194-228)."""
    iou = boxes3d.boxes_iou3d(rois[:, :7], gt_boxes[:, :7])
    same = (roi_labels[:, None] == gt_classes[None, :]) & gt_valid[None, :]
    iou = jnp.where(same, iou, -1.0)
    arg = iou.argmax(1)
    return jnp.maximum(iou.max(1), 0.0), arg


def sample_rois_for_rcnn(rng: jax.Array, cfg: RoISamplerConfig,
                         rois: jnp.ndarray, roi_scores: jnp.ndarray,
                         roi_labels: jnp.ndarray, roi_valid: jnp.ndarray,
                         gt_boxes: jnp.ndarray, gt_classes: jnp.ndarray,
                         gt_valid: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """One item (vmap over batch): balanced RoI sampling + labels.

    Returns dict with rois (M,7), gt_of_rois (M,7), gt_iou_of_rois (M,),
    roi_scores, roi_labels, reg_valid_mask, rcnn_cls_labels, roi_valid.
    """
    m = cfg.roi_per_image
    n = rois.shape[0]
    if cfg.sample_roi_by_each_class:
        overlaps, assignment = _max_iou_with_same_class(
            rois, roi_labels, gt_boxes, gt_classes, gt_valid)
    else:
        iou = boxes3d.boxes_iou3d(rois[:, :7], gt_boxes[:, :7])
        iou = jnp.where(gt_valid[None, :], iou, -1.0)
        overlaps, assignment = jnp.maximum(iou.max(1), 0.0), iou.argmax(1)

    fg_thresh = min(cfg.reg_fg_thresh, cfg.cls_fg_thresh)
    is_fg = (overlaps >= fg_thresh) & roi_valid
    is_easy = (overlaps < cfg.cls_bg_thresh_lo) & roi_valid
    is_hard = (overlaps < cfg.reg_fg_thresh) \
        & (overlaps >= cfg.cls_bg_thresh_lo) & roi_valid

    n_fg_quota = int(round(cfg.fg_ratio * m))
    r1, r2 = jax.random.split(rng)
    # fg: random rank, top quota
    fg_keys = jnp.where(is_fg, jax.random.uniform(r1, (n,)), -jnp.inf)
    fg_val, fg_idx = jax.lax.top_k(fg_keys, min(n_fg_quota, n))
    fg_ok = jnp.isfinite(fg_val)

    # bg: interleave hard/easy at hard_bg_ratio; rank within group is random
    u = jax.random.uniform(r2, (n,))
    order = jnp.argsort(jnp.where(is_hard, u, jnp.inf))
    hard_pos = jnp.full((n,), jnp.inf).at[order].set(
        jnp.where(jnp.arange(n) < is_hard.sum(),
                  jnp.arange(n) / max(cfg.hard_bg_ratio, 1e-3), jnp.inf))
    order_e = jnp.argsort(jnp.where(is_easy, u, jnp.inf))
    easy_pos = jnp.full((n,), jnp.inf).at[order_e].set(
        jnp.where(jnp.arange(n) < is_easy.sum(),
                  0.5 + jnp.arange(n) / max(1.0 - cfg.hard_bg_ratio, 1e-3),
                  jnp.inf))
    bg_pos = jnp.minimum(hard_pos, easy_pos)     # each roi in one group only
    bg_val, bg_idx = jax.lax.top_k(-bg_pos, min(m, n))
    bg_ok = jnp.isfinite(bg_val)

    # merge: fg slots first (priority 0), then bg in order (priority 1)
    cand_idx = jnp.concatenate([fg_idx, bg_idx])
    cand_ok = jnp.concatenate([fg_ok, bg_ok])
    prio = jnp.concatenate([
        jnp.where(fg_ok, jnp.arange(fg_idx.shape[0], dtype=jnp.float32),
                  jnp.inf),
        jnp.where(bg_ok, 1e6 + jnp.arange(bg_idx.shape[0], dtype=jnp.float32),
                  jnp.inf)])
    top = jnp.argsort(prio)[:m]
    sel = cand_idx[top]
    sel_ok = cand_ok[top]

    s_overlaps = jnp.where(sel_ok, overlaps[sel], 0.0)
    out = {
        "rois": rois[sel, :7] * sel_ok[:, None],
        "gt_of_rois": gt_boxes[assignment[sel], :7] * sel_ok[:, None],
        "gt_iou_of_rois": s_overlaps,
        "roi_scores": jnp.where(sel_ok, roi_scores[sel], 0.0),
        "roi_labels": jnp.where(sel_ok, roi_labels[sel], 0),
        "roi_valid": sel_ok,
    }
    out["reg_valid_mask"] = ((s_overlaps > cfg.reg_fg_thresh)
                             & sel_ok).astype(jnp.int32)
    if cfg.cls_score_type == "cls":
        cls = (s_overlaps > cfg.cls_fg_thresh).astype(jnp.float32)
        ignore = (s_overlaps > cfg.cls_bg_thresh) \
            & (s_overlaps < cfg.cls_fg_thresh)
        cls = jnp.where(ignore, -1.0, cls)
    elif cfg.cls_score_type == "roi_iou":
        fg = s_overlaps > cfg.cls_fg_thresh
        bg = s_overlaps < cfg.cls_bg_thresh
        mid = ~fg & ~bg
        soft = (s_overlaps - cfg.cls_bg_thresh) \
            / (cfg.cls_fg_thresh - cfg.cls_bg_thresh)
        cls = fg.astype(jnp.float32) + mid * soft
    else:
        raise NotImplementedError(cfg.cls_score_type)
    out["rcnn_cls_labels"] = jnp.where(sel_ok, cls, -1.0)
    return out


def canonical_gt_transform(rois: jnp.ndarray, gt_of_rois: jnp.ndarray
                           ) -> jnp.ndarray:
    """GT boxes into each RoI's canonical frame with heading flip/clamp
    (roi_head_template.assign_targets:113-133)."""
    roi_center = rois[:, 0:3]
    roi_ry = rois[:, 6] % (2 * np.pi)
    gt = gt_of_rois.at[:, 0:3].add(-roi_center)
    xyz = rotate_points_along_z(gt[:, None, 0:3], -roi_ry)[:, 0]
    heading = (gt[:, 6] - roi_ry) % (2 * np.pi)
    opposite = (heading > np.pi * 0.5) & (heading < np.pi * 1.5)
    heading = jnp.where(opposite, (heading + np.pi) % (2 * np.pi), heading)
    heading = jnp.where(heading > np.pi, heading - 2 * np.pi, heading)
    heading = jnp.clip(heading, -np.pi / 2, np.pi / 2)
    return jnp.concatenate([xyz, gt[:, 3:6], heading[:, None]], -1)


def roi_box_loss(coder: ResidualCoder, rcnn_reg: jnp.ndarray,
                 rois: jnp.ndarray, gt_ct: jnp.ndarray,
                 gt_src: jnp.ndarray, reg_valid: jnp.ndarray,
                 corner_weight: float = 1.0, reg_weight: float = 1.0,
                 use_corner_loss: bool = True) -> Dict[str, jnp.ndarray]:
    """Smooth-L1 on canonical residuals + corner regularization
    (roi_head_template.get_box_reg_layer_loss:136-198). Flat (B*M, ...)."""
    rois_anchor = rois.at[:, 0:3].set(0.0).at[:, 6].set(0.0)
    reg_targets = coder.encode(gt_ct, rois_anchor)
    fg = reg_valid.astype(jnp.float32)
    l1 = loss_lib.smooth_l1_loss(rcnn_reg, reg_targets)
    reg_loss = (l1.sum(-1) * fg).sum() / jnp.maximum(fg.sum(), 1.0)
    out = {"rcnn_loss_reg": reg_loss * reg_weight}
    if use_corner_loss:
        boxes = decode_roi_boxes(coder, rcnn_reg, rois)
        corner = loss_lib.corner_loss(boxes[:, :7], gt_src[:, :7])
        out["rcnn_loss_corner"] = (corner * fg).sum() \
            / jnp.maximum(fg.sum(), 1.0) * corner_weight
    out["rcnn_loss_reg_total"] = sum(out.values())
    return out


def roi_cls_loss(rcnn_cls: jnp.ndarray, cls_labels: jnp.ndarray,
                 cls_weight: float = 1.0) -> jnp.ndarray:
    """BCE vs (possibly soft) labels, ignoring -1
    (roi_head_template.get_box_cls_layer_loss:200-218)."""
    valid = (cls_labels >= 0).astype(jnp.float32)
    p = jnp.clip(jax.nn.sigmoid(rcnn_cls.reshape(-1)), 1e-7, 1 - 1e-7)
    t = jnp.clip(cls_labels, 0.0, 1.0)
    bce = -(t * jnp.log(p) + (1 - t) * jnp.log(1 - p))
    return (bce * valid).sum() / jnp.maximum(valid.sum(), 1.0) * cls_weight


def decode_roi_boxes(coder: ResidualCoder, rcnn_reg: jnp.ndarray,
                     rois: jnp.ndarray) -> jnp.ndarray:
    """Local refinement -> global boxes
    (roi_head_template.generate_predicted_boxes:233-261). Flat (N, ...)."""
    local_rois = rois.at[:, 0:3].set(0.0)
    boxes = coder.decode(rcnn_reg, local_rois)
    xyz = rotate_points_along_z(boxes[:, None, 0:3], rois[:, 6])[:, 0]
    return jnp.concatenate([xyz + rois[:, 0:3], boxes[:, 3:]], -1)


def roi_grid_points(rois: jnp.ndarray, grid_size: int) -> jnp.ndarray:
    """Dense GxGxG global grid points per RoI
    (voxelrcnn_head.get_global_grid_points_of_roi:167-188 — shared by the
    PV-RCNN and VoxelRCNN heads)."""
    g = grid_size
    idx = jnp.stack(jnp.meshgrid(jnp.arange(g), jnp.arange(g), jnp.arange(g),
                                 indexing="ij"), -1).reshape(-1, 3)  # (G3, 3)
    # columns are (x, y, z) with x varying SLOWEST, matching the reference's
    # nonzero() enumeration of a (g, g, g) ones tensor (get_dense_grid_points)
    # so pooled-feature flattening lines up for weight-level parity.
    local = (idx + 0.5) / g                              # (G3, 3) in [0, 1]
    dims = rois[:, None, 3:6]
    pts = (local[None] - 0.5) * dims                     # centered local
    pts = rotate_points_along_z(pts, rois[:, 6])
    return pts + rois[:, None, 0:3]                      # (N, G3, 3)
