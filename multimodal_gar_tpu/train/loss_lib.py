"""Detection loss library (capability surface of pcdet/utils/loss_utils.py).

These losses are not on MGAR's active path (the reference vendors them with
OpenPCDet, unused under mil3.yaml — SURVEY.md §2.8) but belong to the
framework's capability surface for the detector families:
  - sigmoid focal classification loss (loss_utils.py:10-73)
  - weighted smooth-L1 / L1 regression losses (:76-180)
  - weighted (per-anchor) softmax cross-entropy (:183-208)
  - corner loss (:211-233)
  - CenterNet gaussian focal loss (:335-400)
All batched jnp with explicit per-anchor weights.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.boxes3d import boxes_to_corners_3d


def sigmoid_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       weights: jnp.ndarray, gamma: float = 2.0,
                       alpha: float = 0.25) -> jnp.ndarray:
    """Per-element sigmoid focal loss, scaled by anchor weights."""
    p = jax.nn.sigmoid(logits)
    alpha_w = alpha * targets + (1 - alpha) * (1 - targets)
    pt = targets * (1 - p) + (1 - targets) * p
    focal = alpha_w * jnp.power(pt, gamma)
    bce = jnp.maximum(logits, 0) - logits * targets \
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = focal * bce
    return loss * weights[..., None] if weights.ndim == loss.ndim - 1 \
        else loss * weights


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   weights: jnp.ndarray | None = None,
                   beta: float = 1.0 / 9.0) -> jnp.ndarray:
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff ** 2 / beta, diff - 0.5 * beta)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
            weights: jnp.ndarray | None = None) -> jnp.ndarray:
    loss = jnp.abs(pred - target)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_cross_entropy(logits: jnp.ndarray, one_hot: jnp.ndarray,
                           weights: jnp.ndarray) -> jnp.ndarray:
    """Per-anchor weighted softmax CE (loss_utils.WeightedCrossEntropyLoss)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(one_hot * logp, axis=-1) * weights


def corner_loss(pred_boxes: jnp.ndarray, gt_boxes: jnp.ndarray,
                beta: float = 1.0) -> jnp.ndarray:
    """Per-box corner-distance loss with flipped-heading minimum
    (loss_utils.get_corner_loss_lidar:211-233)."""
    pc = boxes_to_corners_3d(pred_boxes)
    gc = boxes_to_corners_3d(gt_boxes)
    flip = gt_boxes.at[:, 6].add(jnp.pi)
    gcf = boxes_to_corners_3d(flip)
    d = jnp.minimum(jnp.linalg.norm(pc - gc, axis=-1),
                    jnp.linalg.norm(pc - gcf, axis=-1))      # (N, 8)
    huber = jnp.where(d < beta, 0.5 * d ** 2 / beta, d - 0.5 * beta)
    return jnp.mean(huber, axis=-1)


def gaussian_focal_loss(pred_heatmap: jnp.ndarray, gt_heatmap: jnp.ndarray,
                        alpha: float = 2.0, beta: float = 4.0,
                        eps: float = 1e-6) -> jnp.ndarray:
    """CenterNet heatmap focal loss (loss_utils.py:335-400), mean over
    positive centers."""
    pos = (gt_heatmap >= 1.0).astype(pred_heatmap.dtype)
    neg = 1.0 - pos
    p = jnp.clip(pred_heatmap, eps, 1 - eps)
    pos_loss = -jnp.log(p) * jnp.power(1 - p, alpha) * pos
    neg_loss = -jnp.log(1 - p) * jnp.power(p, alpha) \
        * jnp.power(1 - gt_heatmap, beta) * neg
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    return (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / n_pos


def set_random_seed(seed: int):
    """Seed helper (pcdet common_utils.set_random_seed:102 analogue):
    returns a jax PRNG key and seeds numpy's legacy + generator state."""
    import numpy as np
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
