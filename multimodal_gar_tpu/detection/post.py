"""Detection post-processing: NMS selection + recall records.

Capability parity with:
  - model_nms_utils.class_agnostic_nms / multi_classes_nms
    (pcdet/models/model_utils/model_nms_utils.py:6-66)
  - Detector3DTemplate.post_processing + generate_recall_record
    (pcdet/models/detectors/detector3d_template.py:178-328)

TPU-native design: everything is fixed-shape. Selection returns a padded
(max_out,) set with a validity mask instead of dynamically-sized index lists;
score thresholding folds into the mask. The NMS core is ops/boxes3d.nms_bev
(rotated-IoU suppression sweep), nms_normal_bev, or circle_nms
(center-distance suppression, centernet_utils.py:100-130).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import boxes3d


@dataclasses.dataclass(frozen=True)
class NMSConfig:
    # nms_bev | nms_normal_bev | circle_nms. For circle_nms, nms_thresh is
    # the SQUARED-center-distance threshold (the reference's min_radius,
    # centernet_utils.py:100-130) — used by the CenterPoint family.
    nms_type: str = "nms_bev"
    nms_thresh: float = 0.7
    nms_pre_maxsize: int = 1024
    nms_post_maxsize: int = 256
    multi_classes_nms: bool = False
    score_thresh: float = 0.1
    output_raw_score: bool = False
    recall_thresh_list: Tuple[float, ...] = (0.3, 0.5, 0.7)


def _nms_fn(name: str):
    return {"nms_bev": boxes3d.nms_bev,
            "nms_normal_bev": boxes3d.nms_normal_bev,
            "circle_nms": boxes3d.circle_nms}[name]


def class_agnostic_nms(scores: jnp.ndarray, boxes: jnp.ndarray,
                       cfg: NMSConfig,
                       valid: Optional[jnp.ndarray] = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One item: (N,) scores, (N, 7) boxes -> top nms_post_maxsize survivors.

    Returns (sel_idx (K,), sel_scores (K,), sel_valid (K,)); selection order
    is by descending score, matching model_nms_utils.class_agnostic_nms.
    """
    n = scores.shape[0]
    ok = scores >= cfg.score_thresh
    if valid is not None:
        ok = ok & valid
    masked = jnp.where(ok, scores, -jnp.inf)
    k_pre = min(cfg.nms_pre_maxsize, n)
    top_scores, top_idx = jax.lax.top_k(masked, k_pre)
    top_boxes = boxes[top_idx]
    keep = _nms_fn(cfg.nms_type)(top_boxes, top_scores, cfg.nms_thresh,
                                 valid=jnp.isfinite(top_scores))
    kept_scores = jnp.where(keep, top_scores, -jnp.inf)
    k_post = min(cfg.nms_post_maxsize, k_pre)
    sel_scores, sel_of_top = jax.lax.top_k(kept_scores, k_post)
    sel_idx = top_idx[sel_of_top]
    sel_valid = jnp.isfinite(sel_scores)
    return sel_idx, jnp.where(sel_valid, sel_scores, 0.0), sel_valid


def multi_classes_nms(cls_scores: jnp.ndarray, boxes: jnp.ndarray,
                      cfg: NMSConfig,
                      valid: Optional[jnp.ndarray] = None):
    """Per-class NMS (model_nms_utils.multi_classes_nms:28-66), one item.

    cls_scores (N, C) normalized; returns (boxes (C*K, 7), scores, labels
    1-based, valid)."""
    num_class = cls_scores.shape[1]
    outs = []
    for k in range(num_class):
        idx, sc, v = class_agnostic_nms(cls_scores[:, k], boxes, cfg, valid)
        outs.append((boxes[idx], sc,
                     jnp.full_like(idx, k + 1, dtype=jnp.int32), v))
    bx = jnp.concatenate([o[0] for o in outs])
    sc = jnp.concatenate([o[1] for o in outs])
    lb = jnp.concatenate([o[2] for o in outs])
    vd = jnp.concatenate([o[3] for o in outs])
    return bx, sc, lb, vd


def post_processing(batch_cls_preds: jnp.ndarray, batch_box_preds: jnp.ndarray,
                    cfg: NMSConfig, cls_preds_normalized: bool = False,
                    valid: Optional[jnp.ndarray] = None,
                    labels: Optional[jnp.ndarray] = None
                    ) -> Dict[str, jnp.ndarray]:
    """Batched final-box selection (detector3d_template.py:178-284).

    batch_cls_preds (B, N, num_class) logits (or probabilities when
    cls_preds_normalized), batch_box_preds (B, N, 7+). `labels` (B, N)
    1-based overrides the argmax class — the template's has_class_labels
    path (detector3d_template.py:243-247), used by two-stage heads whose
    rcnn score is class-agnostic and whose class comes from the RoI.
    Returns padded {"boxes" (B, K, 7), "scores", "labels", "valid"}.
    """
    cls = batch_cls_preds if cls_preds_normalized \
        else jax.nn.sigmoid(batch_cls_preds)
    if labels is None:
        labels = cls.argmax(-1).astype(jnp.int32) + 1

    if cfg.multi_classes_nms:
        def per_item(c, raw_c, b, v, _lb):
            return multi_classes_nms(c, b, cfg, v)
    else:
        def per_item(c, raw_c, b, v, lb):
            score = c.max(-1)
            idx, sc, vd = class_agnostic_nms(score, b, cfg, v)
            if cfg.output_raw_score:     # template.py:263-265
                sc = raw_c.max(-1)[idx] * vd.astype(c.dtype)
            return b[idx], sc, lb[idx], vd

    if valid is None:
        valid = jnp.ones(cls.shape[:2], bool)
    bx, sc, lb, vd = jax.vmap(per_item)(cls, batch_cls_preds,
                                        batch_box_preds[..., :7], valid,
                                        labels)
    return {"boxes": bx, "scores": sc, "labels": lb * vd.astype(jnp.int32),
            "valid": vd}


def generate_recall_record(pred_boxes: jnp.ndarray, pred_valid: jnp.ndarray,
                           gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray,
                           thresh_list: Tuple[float, ...] = (0.3, 0.5, 0.7),
                           rois: Optional[jnp.ndarray] = None,
                           roi_valid: Optional[jnp.ndarray] = None
                           ) -> Dict[str, jnp.ndarray]:
    """Recall counters vs GT (detector3d_template.generate_recall_record:287).

    One item (vmap over batch and sum for the epoch accumulation the
    reference keeps in recall_dict). Returns {"gt": count,
    "rcnn_<t>": recalled, "roi_<t>": recalled} as scalars.
    """
    iou = boxes3d.boxes_iou3d(pred_boxes[:, :7], gt_boxes[:, :7])
    iou = jnp.where(pred_valid[:, None] & gt_valid[None, :], iou, 0.0)
    best = iou.max(axis=0)                                  # (G,)
    out = {"gt": gt_valid.sum()}
    for t in thresh_list:
        out[f"rcnn_{t}"] = ((best > t) & gt_valid).sum()
    if rois is not None:
        riou = boxes3d.boxes_iou3d(rois[:, :7], gt_boxes[:, :7])
        rv = roi_valid if roi_valid is not None \
            else jnp.ones(rois.shape[:1], bool)
        riou = jnp.where(rv[:, None] & gt_valid[None, :], riou, 0.0)
        rbest = riou.max(axis=0)
        for t in thresh_list:
            out[f"roi_{t}"] = ((rbest > t) & gt_valid).sum()
    return out
