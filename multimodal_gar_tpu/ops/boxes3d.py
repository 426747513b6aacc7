"""Rotated 3D box geometry: corners, containment, BEV/3D IoU, NMS, ROI pooling.

TPU-native equivalents of the reference's iou3d_nms / roiaware_pool3d /
roipoint_pool3d CUDA kernels (pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu —
rotated-rectangle polygon clipping, bitmask NMS; roiaware_pool3d_kernel.cu;
roipoint_pool3d_kernel.cu) and box_utils helpers (pcdet/utils/box_utils.py).
All fixed-shape: the polygon clip uses a static 8-vertex buffer (a rect-rect
intersection has at most 8 vertices), NMS is a fori_loop over a precomputed
IoU matrix instead of a CUDA bitmask sweep.

Box layout: (cx, cy, cz, dx, dy, dz, yaw) — center + full extents + z-rotation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# corners / containment
# ---------------------------------------------------------------------------

def boxes_to_corners_3d(boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 7) -> (N, 8, 3) corners (pcdet box_utils.boxes_to_corners_3d:28)."""
    signs = jnp.asarray(
        [[1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
         [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1]], jnp.float32)
    local = signs[None] * boxes[:, None, 3:6] / 2.0            # (N, 8, 3)
    c, s = jnp.cos(boxes[:, 6]), jnp.sin(boxes[:, 6])
    x = local[..., 0] * c[:, None] - local[..., 1] * s[:, None]
    y = local[..., 0] * s[:, None] + local[..., 1] * c[:, None]
    xyz = jnp.stack([x, y, local[..., 2]], axis=-1)
    return xyz + boxes[:, None, 0:3]


def points_in_boxes(points: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """(P, 3) x (N, 7) -> (P, N) bool containment (roiaware points_in_boxes)."""
    rel = points[:, None, :] - boxes[None, :, 0:3]             # (P, N, 3)
    c, s = jnp.cos(-boxes[:, 6]), jnp.sin(-boxes[:, 6])
    lx = rel[..., 0] * c[None] - rel[..., 1] * s[None]
    ly = rel[..., 0] * s[None] + rel[..., 1] * c[None]
    half = boxes[None, :, 3:6] / 2.0
    return ((jnp.abs(lx) <= half[..., 0]) & (jnp.abs(ly) <= half[..., 1])
            & (jnp.abs(rel[..., 2]) <= half[..., 2]))


# ---------------------------------------------------------------------------
# rotated BEV overlap via Sutherland-Hodgman clipping (static 8-vert buffer)
# ---------------------------------------------------------------------------

_VBUF = 8  # max vertices of a rect-rect intersection


def _bev_corners(box: jnp.ndarray) -> jnp.ndarray:
    """(7,) -> (4, 2) BEV corners, counter-clockwise."""
    signs = jnp.asarray([[1, 1], [-1, 1], [-1, -1], [1, -1]], jnp.float32)
    local = signs * box[3:5] / 2.0
    c, s = jnp.cos(box[6]), jnp.sin(box[6])
    x = local[:, 0] * c - local[:, 1] * s
    y = local[:, 0] * s + local[:, 1] * c
    return jnp.stack([x + box[0], y + box[1]], axis=-1)


def _clip_halfplane(poly, count, p1, p2):
    """Clip (VBUF, 2)/count polygon by the half-plane left of p1->p2."""
    k = poly.shape[0]
    idx = jnp.arange(k)
    safe_count = jnp.maximum(count, 1)
    nxt = poly[(idx + 1) % safe_count]
    edge = p2 - p1
    s_cur = edge[0] * (poly[:, 1] - p1[1]) - edge[1] * (poly[:, 0] - p1[0])
    s_nxt = edge[0] * (nxt[:, 1] - p1[1]) - edge[1] * (nxt[:, 0] - p1[0])
    in_cur = s_cur >= 0
    in_nxt = s_nxt >= 0
    active = idx < count
    denom = s_cur - s_nxt
    t = s_cur / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    inter = poly + t[:, None] * (nxt - poly)

    # per input edge emit: current vertex (if inside), intersection (if crossing)
    pts = jnp.stack([poly, inter], axis=1).reshape(2 * k, 2)
    val = jnp.stack([active & in_cur, active & (in_cur != in_nxt)],
                    axis=1).reshape(2 * k)
    pos = jnp.cumsum(val) - 1
    out = jnp.zeros((k, 2), poly.dtype)
    out = out.at[jnp.where(val, pos, k)].set(pts, mode="drop")
    return out, jnp.sum(val).astype(jnp.int32)


def _poly_area(poly, count):
    k = poly.shape[0]
    idx = jnp.arange(k)
    safe_count = jnp.maximum(count, 1)
    nxt = poly[(idx + 1) % safe_count]
    cross = poly[:, 0] * nxt[:, 1] - nxt[:, 0] * poly[:, 1]
    cross = jnp.where(idx < count, cross, 0.0)
    return jnp.abs(jnp.sum(cross)) / 2.0


def _rect_intersection_area(box_a: jnp.ndarray, box_b: jnp.ndarray):
    ca = _bev_corners(box_a)
    cb = _bev_corners(box_b)
    poly = jnp.zeros((_VBUF, 2), jnp.float32).at[:4].set(ca)
    count = jnp.asarray(4, jnp.int32)
    for i in range(4):
        poly, count = _clip_halfplane(poly, count, cb[i], cb[(i + 1) % 4])
    return _poly_area(poly, count)


def boxes_overlap_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 7) x (M, 7) -> (N, M) rotated BEV intersection areas."""
    return jax.vmap(lambda a: jax.vmap(
        lambda b: _rect_intersection_area(a, b))(boxes_b))(boxes_a)


def boxes_iou_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    inter = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = boxes_a[:, 3] * boxes_a[:, 4]
    area_b = boxes_b[:, 3] * boxes_b[:, 4]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def boxes_iou3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 7) x (M, 7) -> (N, M) 3D IoU (iou3d_nms_utils.boxes_iou3d_gpu)."""
    inter_bev = boxes_overlap_bev(boxes_a, boxes_b)
    za1 = boxes_a[:, 2] - boxes_a[:, 5] / 2
    za2 = boxes_a[:, 2] + boxes_a[:, 5] / 2
    zb1 = boxes_b[:, 2] - boxes_b[:, 5] / 2
    zb2 = boxes_b[:, 2] + boxes_b[:, 5] / 2
    zo = jnp.clip(jnp.minimum(za2[:, None], zb2[None, :])
                  - jnp.maximum(za1[:, None], zb1[None, :]), 0.0)
    inter = inter_bev * zo
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    return inter / jnp.maximum(vol_a[:, None] + vol_b[None, :] - inter, 1e-9)


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=())
def nms_bev(boxes: jnp.ndarray, scores: jnp.ndarray,
            iou_threshold: float = 0.7,
            valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy rotated-BEV NMS -> (N,) keep mask (iou3d_nms nms_gpu analogue).

    O(N^2) IoU matrix + sequential suppression sweep (fori_loop), replacing
    the CUDA 64-bit bitmask kernel. N here is <= a few hundred boxes.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    iou = boxes_iou_bev(boxes, boxes)
    order = jnp.argsort(-scores)

    def body(i, keep):
        bi = order[i]
        # suppressed if any higher-scoring kept box overlaps it
        higher = jnp.arange(n) < i
        sup = jnp.any(keep[order] & higher & (iou[bi, order] > iou_threshold))
        return keep.at[bi].set(valid[bi] & ~sup)

    keep0 = jnp.zeros((n,), bool)
    return jax.lax.fori_loop(0, n, body, keep0)


def nms_normal_bev(boxes: jnp.ndarray, scores: jnp.ndarray,
                   iou_threshold: float = 0.7,
                   valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Axis-aligned (non-rotated) NMS variant (nms_normal_gpu analogue)."""
    aa = boxes.at[:, 6].set(0.0)
    return nms_bev(aa, scores, iou_threshold, valid)


def circle_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
               dist_threshold: float = 2.0,
               valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy center-distance NMS -> (N,) keep mask.

    CenterPoint-family variant (reference
    pcdet/models/model_utils/centernet_utils.py:100-130 circle_nms /
    _circle_nms): a lower-scored box is suppressed when its SQUARED BEV
    center distance to a kept box is <= dist_threshold. Note the reference
    compares the squared distance against the raw ``min_radius`` config
    value (`dist <= thresh` with no square on thresh) — kept faithful here,
    so thresholds from pcdet configs transfer unchanged.

    Same O(N^2)-matrix + sequential-sweep structure as nms_bev: fixed
    shapes, fori_loop, no data-dependent sizes.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    centers = boxes[:, :2]
    d2 = jnp.sum((centers[:, None, :] - centers[None, :, :]) ** 2, -1)
    order = jnp.argsort(-scores)

    def body(i, keep):
        bi = order[i]
        higher = jnp.arange(n) < i
        sup = jnp.any(keep[order] & higher
                      & (d2[bi, order] <= dist_threshold))
        return keep.at[bi].set(valid[bi] & ~sup)

    keep0 = jnp.zeros((n,), bool)
    return jax.lax.fori_loop(0, n, body, keep0)


# ---------------------------------------------------------------------------
# ROI-aware / ROI point pooling
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("out_size", "pool_method"))
def roiaware_pool3d(points: jnp.ndarray, features: jnp.ndarray,
                    boxes: jnp.ndarray, out_size: int = 6,
                    pool_method: str = "max") -> jnp.ndarray:
    """Pool point features into a per-box (G, G, G, C) grid.

    roiaware_pool3d_kernel.cu analogue: each in-box point lands in a grid
    cell by its box-local coordinates; cells take the max (or mean) of their
    points' features.

    Args:
      points: (P, 3); features: (P, C); boxes: (N, 7).
    Returns:
      (N, G, G, G, C).
    """
    p, c = features.shape
    g3 = out_size ** 3

    def per_box(box):
        rel = points - box[0:3]
        cs, sn = jnp.cos(-box[6]), jnp.sin(-box[6])
        lx = rel[:, 0] * cs - rel[:, 1] * sn
        ly = rel[:, 0] * sn + rel[:, 1] * cs
        lz = rel[:, 2]
        local = jnp.stack([lx, ly, lz], -1)
        half = box[3:6] / 2.0
        inside = jnp.all(jnp.abs(local) <= half, axis=-1)
        # zero-extent (padded) boxes: 2*half/out_size is 0 and the division
        # would produce NaN cells whose int cast scatters arbitrarily
        cell_size = jnp.maximum(2 * half / out_size, 1e-6)
        cell = jnp.floor((local + half) / cell_size)
        cell = jnp.clip(cell, 0, out_size - 1).astype(jnp.int32)
        flat = (cell[:, 0] * out_size + cell[:, 1]) * out_size + cell[:, 2]
        flat = jnp.where(inside, flat, g3)              # dump outside points
        if pool_method == "max":
            grid = jnp.full((g3 + 1, c), -jnp.inf, features.dtype)
            grid = grid.at[flat].max(features)
            grid = jnp.where(jnp.isfinite(grid), grid, 0.0)
        else:
            num = jnp.zeros((g3 + 1, c), features.dtype).at[flat].add(features)
            cnt = jnp.zeros((g3 + 1, 1), features.dtype).at[flat].add(1.0)
            grid = num / jnp.maximum(cnt, 1.0)
        return grid[:g3].reshape(out_size, out_size, out_size, c)

    return jax.vmap(per_box)(boxes)


@partial(jax.jit, static_argnames=("num_sampled_points",))
def roipoint_pool3d(points: jnp.ndarray, features: jnp.ndarray,
                    boxes: jnp.ndarray, num_sampled_points: int = 512):
    """First-k in-box raw points + features per box (roipoint_pool3d analogue).

    Slots beyond the in-box count are filled by CYCLING through the real
    in-box points (reference roipoint_pool3d_kernel.cu:94-95:
    ``pooled_idx[k] = k % cnt``) — zero-filling instead would feed fake
    origin points into downstream per-ROI encoders (MPPNet, PointRCNN)
    and shift their pooling statistics. Returns (pooled (N, K, 3+C),
    empty (N,) bool)."""
    inside = points_in_boxes(points, boxes)                  # (P, N)
    p = points.shape[0]
    k_eff = min(num_sampled_points, p)
    order = jnp.arange(p, dtype=jnp.int32)
    slot = jnp.arange(num_sampled_points, dtype=jnp.int32)

    def per_box(mask):
        priority = jnp.where(mask, order, p)
        _, pos = jax.lax.top_k(-priority, k_eff)
        if k_eff < num_sampled_points:
            pos = jnp.concatenate(
                [pos, jnp.full((num_sampled_points - k_eff,), pos[0],
                               pos.dtype)])
        ok = priority[pos] < p
        cnt = jnp.maximum(jnp.sum(ok.astype(jnp.int32)), 1)
        # cyclic duplication of the real points over the empty slots
        pos = jnp.take(pos, slot % cnt)
        pooled = jnp.concatenate([points[pos], features[pos]], axis=-1)
        empty = ~ok[0]
        return jnp.where(empty, 0.0, pooled), empty

    return jax.vmap(per_box)(inside.T)


def enlarge_box3d(boxes: jnp.ndarray, extra_width=(0.0, 0.0, 0.0)) -> jnp.ndarray:
    """Grow boxes by extra extents (pcdet box_utils.enlarge_box3d:187)."""
    extra = jnp.asarray(extra_width, boxes.dtype)
    return boxes.at[..., 3:6].add(2.0 * extra)


def boxes3d_nearest_bev_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray
                            ) -> jnp.ndarray:
    """Axis-aligned BEV IoU with the nearest 0/90-degree orientation
    (pcdet box_utils.boxes3d_nearest_bev_iou:328): yaw snapped to the closer
    right angle, then plain AABB IoU."""
    def to_aabb(b):
        yaw = jnp.abs(jnp.mod(b[:, 6], jnp.pi))
        swap = (yaw > jnp.pi / 4) & (yaw < 3 * jnp.pi / 4)
        dx = jnp.where(swap, b[:, 4], b[:, 3])
        dy = jnp.where(swap, b[:, 3], b[:, 4])
        return jnp.stack([b[:, 0] - dx / 2, b[:, 1] - dy / 2,
                          b[:, 0] + dx / 2, b[:, 1] + dy / 2], -1)

    a = to_aabb(boxes_a)
    b = to_aabb(boxes_b)
    ix1 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    iy1 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    ix2 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    iy2 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)
