"""Anchor-target assignment for dense heads, fixed-shape and jit-able.

Capability parity with pcdet's AxisAlignedTargetAssigner
(dense_heads/target_assigner/axis_aligned_target_assigner.py:36-210):
per-class IoU matching with matched/unmatched thresholds, forced matching of
each GT's best anchor, residual-coder regression targets.

TPU-native design: instead of the reference's per-batch-item / per-class
Python loops over variable-size GT subsets, ALL anchors are assigned at once
against padded GT slots. Anchors carry a static per-anchor class id and
per-anchor thresholds; the (num_anchors, num_gt) IoU matrix is masked by
class agreement and GT validity. Everything is fixed-shape, so the whole
assignment jits and vmaps over the batch.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import boxes3d
from .anchors import AnchorClassConfig, generate_anchors
from .box_coders import ResidualCoder


@dataclasses.dataclass(frozen=True)
class AnchorSet:
    """Static interleaved anchor data (numpy, build-time).

    Per BEV location the anchor order is class-major then (size, rotation) —
    the reference's torch.cat(anchors, dim=-3) + view(-1, 7) layout
    (anchor_head_template.py:243-247), which is also the channel layout the
    1x1 conv heads must emit. Requires one bottom-height per class (nz == 1),
    as in every upstream single-head config.
    """
    anchors: np.ndarray            # (N, 7) float32
    class_ids: np.ndarray          # (N,) int32, 1-based
    matched_thr: np.ndarray        # (N,) float32
    unmatched_thr: np.ndarray      # (N,) float32
    num_per_loc: int               # sum over classes of S*R
    fmap_size: Tuple[int, int]     # (H=ny, W=nx)


def build_anchor_set(configs: Sequence[AnchorClassConfig],
                     grid_size: Tuple[int, int],
                     point_cloud_range: Sequence[float]) -> AnchorSet:
    per_class, num_per_loc = generate_anchors(configs, grid_size,
                                              point_cloud_range)
    fx = grid_size[0] // configs[0].feature_map_stride
    fy = grid_size[1] // configs[0].feature_map_stride
    loc = fy * fx
    blocks, cids, mts, uts = [], [], [], []
    for i, (cfg, a, n) in enumerate(zip(configs, per_class, num_per_loc)):
        assert len(cfg.anchor_bottom_heights) == 1, \
            "interleaved head layout requires one bottom height per class"
        assert a.shape[0] == loc * n, (a.shape, loc, n)
        blocks.append(a.reshape(loc, n, 7))
        cids.append(np.full((loc, n), i + 1, np.int32))
        mts.append(np.full((loc, n), cfg.matched_threshold, np.float32))
        uts.append(np.full((loc, n), cfg.unmatched_threshold, np.float32))
    return AnchorSet(
        anchors=np.concatenate(blocks, 1).reshape(-1, 7),
        class_ids=np.concatenate(cids, 1).reshape(-1),
        matched_thr=np.concatenate(mts, 1).reshape(-1),
        unmatched_thr=np.concatenate(uts, 1).reshape(-1),
        num_per_loc=sum(num_per_loc), fmap_size=(fy, fx))


def assign_targets(anchor_set: AnchorSet, coder: ResidualCoder,
                   gt_boxes: jnp.ndarray, gt_classes: jnp.ndarray,
                   gt_valid: jnp.ndarray, match_height: bool = False,
                   norm_by_num_examples: bool = False):
    """Assign padded GTs to anchors for one batch item (vmap over batch).

    Args:
      gt_boxes: (G, 7); gt_classes: (G,) int 1-based; gt_valid: (G,) bool.
    Returns:
      labels: (N,) int32 — -1 ignore, 0 background, else class id;
      reg_targets: (N, code_size);
      reg_weights: (N,).
    """
    anchors = jnp.asarray(anchor_set.anchors)
    a_cls = jnp.asarray(anchor_set.class_ids)
    mthr = jnp.asarray(anchor_set.matched_thr)
    uthr = jnp.asarray(anchor_set.unmatched_thr)

    iou_fn = boxes3d.boxes_iou3d if match_height \
        else boxes3d.boxes3d_nearest_bev_iou
    iou = iou_fn(anchors, gt_boxes)                             # (N, G)
    cand = gt_valid[None, :] & (gt_classes[None, :] == a_cls[:, None])
    iou = jnp.where(cand, iou, -1.0)

    a2g_max = iou.max(axis=1)                                   # (N,)
    a2g_arg = iou.argmax(axis=1)                                # (N,)
    g_max = iou.max(axis=0)                                     # (G,)
    # forced: anchor achieves some valid GT's per-class maximum (> 0)
    forced = jnp.any((iou == g_max[None, :]) & cand & (g_max > 0)[None, :],
                     axis=1)

    matched_cls = gt_classes[a2g_arg]
    labels = jnp.full(anchors.shape[:1], -1, jnp.int32)
    labels = jnp.where(a2g_max < uthr, 0, labels)               # background
    labels = jnp.where(a2g_max >= mthr, matched_cls, labels)    # matched
    labels = jnp.where(forced, matched_cls, labels)             # force-match

    fg = labels > 0
    reg_targets = coder.encode(gt_boxes[a2g_arg], anchors)
    reg_targets = reg_targets * fg[:, None].astype(reg_targets.dtype)

    reg_weights = fg.astype(jnp.float32)
    if norm_by_num_examples:
        num_examples = jnp.maximum((labels >= 0).sum().astype(jnp.float32), 1.0)
        reg_weights = reg_weights / num_examples
    return labels, reg_targets, reg_weights
