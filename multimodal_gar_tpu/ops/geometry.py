"""Pairwise geometric primitives used by the grouping model.

TPU-native (fixed-shape, fully vectorized jnp) equivalents of:
  - torchvision.ops.generalized_box_iou as used at reference gat_model.py:1519
  - torchmetrics pairwise_euclidean_distance as used at reference gat_model.py:1520
  - pcdet.utils.common_utils.rotate_points_along_z (common_utils.py:35)
"""
from __future__ import annotations

import jax.numpy as jnp


def safe_sqrt(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """sqrt with a zero (not inf/NaN) gradient at 0.

    Padded actors share coordinates, so pairwise distances hit exactly 0 where
    the mask is 0; sqrt'(0) = inf would poison gradients through the mask
    multiply (0 * inf = NaN). Double-where keeps both value and grad clean.
    """
    safe = jnp.where(x > eps, x, eps)
    return jnp.where(x > eps, jnp.sqrt(safe), 0.0)


def pairwise_giou_2d(boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise generalized IoU over (N, 4) boxes in (x1, y1, x2, y2) format.

    Returns (N, N) GIoU matrix in [-1, 1]. Matches
    torchvision.ops.generalized_box_iou semantics (degenerate zero-area padded
    boxes produce finite values via eps guards instead of NaN).
    """
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1) * (y2 - y1)                               # (N,)

    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)    # (N, N)

    union = area[:, None] + area[None, :] - inter
    eps = jnp.asarray(1e-7, boxes.dtype)
    iou = inter / jnp.maximum(union, eps)

    # smallest enclosing box
    ex1 = jnp.minimum(x1[:, None], x1[None, :])
    ey1 = jnp.minimum(y1[:, None], y1[None, :])
    ex2 = jnp.maximum(x2[:, None], x2[None, :])
    ey2 = jnp.maximum(y2[:, None], y2[None, :])
    enclose = (ex2 - ex1) * (ey2 - ey1)

    return iou - (enclose - union) / jnp.maximum(enclose, eps)


def pairwise_euclidean(points: jnp.ndarray, zero_diagonal: bool = True) -> jnp.ndarray:
    """Pairwise Euclidean distances over (N, D) points -> (N, N).

    Matches torchmetrics pairwise_euclidean_distance(zero_diagonal=True):
    computed via the expanded quadratic form with clamping at 0.
    """
    sq = jnp.sum(points * points, axis=-1)                     # (N,)
    d2 = sq[:, None] + sq[None, :] - 2.0 * points @ points.T
    d2 = jnp.maximum(d2, 0.0)
    if zero_diagonal:
        n = points.shape[0]
        d2 = d2 * (1.0 - jnp.eye(n, dtype=points.dtype))
    return safe_sqrt(d2)


def rotate_points_along_z(points: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate (B, N, 3+) points by per-batch yaw angles (B,).

    Angle increases x -> y (counter-clockwise), matching reference
    common_utils.py:35-57: p_rot = p @ R with R = [[cos, sin, 0], [-sin, cos, 0], [0, 0, 1]].
    """
    cosa, sina = jnp.cos(angle), jnp.sin(angle)
    zeros = jnp.zeros_like(angle)
    ones = jnp.ones_like(angle)
    rot = jnp.stack([
        cosa, sina, zeros,
        -sina, cosa, zeros,
        zeros, zeros, ones,
    ], axis=-1).reshape(-1, 3, 3)
    xyz = jnp.einsum("bnk,bkm->bnm", points[..., :3], rot)
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def pairwise_cosine_similarity(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Pairwise cosine similarity over (N, D) rows -> (N, N).

    Matches torchmetrics pairwise_cosine_similarity(zero_diagonal=False)
    as used for the Dv matrix at reference gat_model.py:1335.
    """
    norm = safe_sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    xn = x / jnp.maximum(norm, eps)
    return xn @ xn.T
