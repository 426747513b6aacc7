"""MPPNet: multi-frame proposal trajectory refinement (+ E2E memory bank).

Capability parity with pcdet/models/detectors/mppnet.py,
roi_heads/mppnet_head.py:298-992 and mppnet_memory_bank_e2e.py: given
per-frame proposals from a base detector (the reference consumes a frozen
CenterPoint's 'proposals_list'), proposals are linked into trajectories,
per-frame points are cropped inside the (enlarged) trajectory boxes,
embedded with proposal-aware geometry features (offsets to the 8 box corners
+ center, spherical encoding, mppnet_head.py:551-575 / 454-468) and motion
features (offset to the current-frame box + per-frame time embedding,
:577-606), summarized per frame, fused by a transformer over the frame axis
with a learnable global token, and decoded into a confidence + box residual
against the current-frame RoI.

TPU-native design: everything is fixed-shape — K cropped points per
(frame, RoI) via ops/boxes3d.roipoint_pool3d under a (batch x frame) vmap,
T frame tokens per RoI, one dense transformer. The E2E variant threads the
per-frame token memory as explicit functional state instead of an in-module
python list (mppnet_memory_bank_e2e.py's rolling bank).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import boxes3d
from ..ops.geometry import safe_sqrt
from .box_coders import ResidualCoder
from .detectors import DetectorConfig, register_detector
from .post import post_processing
from .roi_heads import canonical_gt_transform, decode_roi_boxes, roi_box_loss, \
    roi_cls_loss


@dataclasses.dataclass(frozen=True)
class MPPNetConfig:
    num_frames: int = 4
    points_per_roi: int = 128
    hidden: int = 64
    num_heads: int = 4
    num_layers: int = 2
    pool_extra_width: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    cls_fg_thresh: float = 0.75
    cls_bg_thresh: float = 0.25


def corner_proxy_points(rois: jnp.ndarray) -> jnp.ndarray:
    """(R, 7) -> (R, 9, 3): 8 corners + center
    (mppnet_head.get_corner_points_of_roi:367-401)."""
    corners = boxes3d.boxes_to_corners_3d(rois)              # (R, 8, 3)
    return jnp.concatenate([corners, rois[:, None, :3]], axis=1)


def spherical_coordinate(offsets: jnp.ndarray,
                         diag: jnp.ndarray) -> jnp.ndarray:
    """Cartesian corner offsets -> (r/diag, cos(theta), sin(phi)) triplets
    (mppnet_head.spherical_coordinate:454-468)."""
    x, y, z = offsets[..., 0], offsets[..., 1], offsets[..., 2]
    r = safe_sqrt(x * x + y * y + z * z)
    theta = jnp.arccos(jnp.clip(z / jnp.maximum(r, 1e-6), -1, 1))
    phi = jnp.arctan2(y, x)
    return jnp.stack([r / jnp.maximum(diag, 1e-6), jnp.cos(theta),
                      jnp.sin(phi)], -1)


class MPPNetHead(nn.Module):
    """Trajectory refinement head over T frames of cropped points."""
    cfg: MPPNetConfig

    @nn.compact
    def __call__(self, frame_points: jnp.ndarray, point_valid: jnp.ndarray,
                 trajectory_rois: jnp.ndarray, roi_valid: jnp.ndarray,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        """
        Args:
          frame_points: (B, T, N, 4) per-frame points (current frame first);
          point_valid: (B, T, N);
          trajectory_rois: (B, T, R, 7) the proposal trajectory;
          roi_valid: (B, R).
        Returns {"rcnn_cls" (B, R), "rcnn_reg" (B, R, 7), "tokens"}.
        """
        c = self.cfg
        b, t, n, _ = frame_points.shape
        r = trajectory_rois.shape[2]

        def crop(pts, pv, rois):
            enlarged = boxes3d.enlarge_box3d(rois, c.pool_extra_width)
            park = jnp.where(pv[:, None], pts[:, :3], 1e6)
            pooled, empty = boxes3d.roipoint_pool3d(
                park, pts[:, 3:], enlarged,
                num_sampled_points=c.points_per_roi)
            return pooled, empty                     # (R, K, 3+C), (R,)

        pooled, empty = jax.vmap(jax.vmap(crop))(
            frame_points, point_valid, trajectory_rois)  # (B,T,R,K,3+C)

        # proposal-aware geometry: offsets to the 9 proxy points, spherical
        rois_flat = trajectory_rois.reshape(b * t * r, 7)
        proxies = corner_proxy_points(rois_flat).reshape(b, t, r, 9, 3)
        diag = jnp.linalg.norm(trajectory_rois[..., 3:6], axis=-1)  # (B,T,R)
        off = pooled[..., None, :3] - proxies[:, :, :, None, :, :]  # B,T,R,K,9,3
        sph = spherical_coordinate(off, diag[..., None, None])
        geo = sph.reshape(b, t, r, c.points_per_roi, 27)
        feat_in = jnp.concatenate([geo, pooled[..., 3:]], -1)

        # motion: offset to the CURRENT-frame box center + time embedding
        cur_center = trajectory_rois[:, :1, :, None, :3]
        motion = pooled[..., :3] - cur_center
        time_emb = self.param("time_embedding",
                              nn.initializers.normal(0.02),
                              (c.num_frames, c.hidden))
        feat_in = jnp.concatenate([feat_in, motion], -1)

        h = nn.Dense(c.hidden, name="point_mlp1")(feat_in)
        h = nn.relu(h)
        h = nn.Dense(c.hidden, name="point_mlp2")(h)
        live = (~empty)[..., None, None]
        h = h * live.astype(h.dtype)
        frame_tok = jnp.max(jnp.where(live, h, -jnp.inf), axis=3)
        frame_tok = jnp.where(jnp.isfinite(frame_tok), frame_tok, 0.0)
        frame_tok = frame_tok + time_emb[None, :t, None, :]   # (B,T,R,H)

        # transformer over the frame axis with a learnable global token
        tokens = jnp.swapaxes(frame_tok, 1, 2).reshape(b * r, t, c.hidden)
        g = self.param("global_token", nn.initializers.normal(0.02),
                       (1, 1, c.hidden))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(g, (b * r, 1, c.hidden)), tokens], axis=1)
        for i in range(c.num_layers):
            att = nn.SelfAttention(num_heads=c.num_heads,
                                   name=f"att{i}")(tokens)
            tokens = nn.LayerNorm(name=f"ln{i}a")(tokens + att)
            ff = nn.Dense(c.hidden * 2, name=f"ff{i}_1")(tokens)
            ff = nn.Dense(c.hidden, name=f"ff{i}_2")(nn.relu(ff))
            tokens = nn.LayerNorm(name=f"ln{i}b")(tokens + ff)
        summary = tokens[:, 0].reshape(b, r, c.hidden)

        valid = roi_valid[..., None].astype(summary.dtype)
        rcnn_cls = nn.Dense(1, name="cls_out")(summary)[..., 0] * valid[..., 0]
        rcnn_reg = nn.Dense(7, name="reg_out",
                            kernel_init=nn.initializers.normal(0.001))(
            summary) * valid
        return {"rcnn_cls": rcnn_cls, "rcnn_reg": rcnn_reg,
                "frame_tokens": frame_tok}


class MPPNetDetector(nn.Module):
    """mppnet.py topology on precomputed per-frame proposals: trajectory
    refinement only (the base single-frame detector is any zoo member)."""
    cfg: DetectorConfig
    mp_cfg: MPPNetConfig = MPPNetConfig()

    @nn.compact
    def __call__(self, frame_points, point_valid, trajectory_rois, roi_valid,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        out = MPPNetHead(self.mp_cfg, name="head")(
            frame_points, point_valid, trajectory_rois, roi_valid, train)
        out["rois"] = trajectory_rois[:, 0]
        out["roi_valid"] = roi_valid
        return out

    def loss(self, preds, gt_boxes, gt_classes, gt_valid
             ) -> Dict[str, jnp.ndarray]:
        """IoU-guided confidence + canonical box regression
        (mppnet_head.get_loss:801-960, simplified to the active terms)."""
        c = self.mp_cfg
        coder = ResidualCoder()
        rois = preds["rois"]
        iou = jax.vmap(boxes3d.boxes_iou3d)(rois, gt_boxes)   # (B, R, G)
        iou = jnp.where(gt_valid[:, None, :], iou, 0.0)
        best = iou.max(-1)
        arg = iou.argmax(-1)
        gt_of = jnp.take_along_axis(gt_boxes, arg[..., None], axis=1)
        fg = best > c.cls_fg_thresh
        bg = best < c.cls_bg_thresh
        soft = (best - c.cls_bg_thresh) / (c.cls_fg_thresh - c.cls_bg_thresh)
        cls_t = jnp.where(fg, 1.0, jnp.where(bg, 0.0, soft))
        cls_t = jnp.where(preds["roi_valid"], cls_t, -1.0)
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        cls_loss = roi_cls_loss(flat(preds["rcnn_cls"]), flat(cls_t))
        gt_ct = jax.vmap(canonical_gt_transform)(rois, gt_of)
        reg = roi_box_loss(coder, flat(preds["rcnn_reg"]), flat(rois),
                           flat(gt_ct), flat(gt_of),
                           flat((best > 0.55) & preds["roi_valid"]))
        return {"rcnn_loss_cls": cls_loss,
                "rcnn_loss_reg": reg["rcnn_loss_reg"],
                "loss": cls_loss + reg["rcnn_loss_reg_total"]}

    def predict(self, preds) -> Dict[str, jnp.ndarray]:
        coder = ResidualCoder()
        boxes = jax.vmap(lambda rg, ro: decode_roi_boxes(coder, rg, ro))(
            preds["rcnn_reg"], preds["rois"])
        scores = jax.nn.sigmoid(preds["rcnn_cls"]) \
            * preds["roi_valid"].astype(jnp.float32)
        # class labels ride with the input proposals (has_class_labels path);
        # callers thread them via preds["roi_labels"] when available
        return post_processing(scores[..., None], boxes, self.cfg.nms,
                               cls_preds_normalized=True,
                               valid=preds["roi_valid"],
                               labels=preds.get("roi_labels"))


class MPPNetE2EDetector(MPPNetDetector):
    """mppnet_e2e.py: online variant with a rolling per-frame token memory
    threaded as functional state (bank in, bank out)."""

    @nn.compact
    def __call__(self, frame_points, point_valid, trajectory_rois, roi_valid,
                 memory: Optional[jnp.ndarray] = None, train: bool = False):
        out = MPPNetHead(self.mp_cfg, name="head")(
            frame_points, point_valid, trajectory_rois, roi_valid, train)
        tok = out["frame_tokens"][:, 0]            # current frame summary
        if memory is None:
            memory = jnp.zeros(
                (tok.shape[0], self.mp_cfg.num_frames) + tok.shape[1:],
                tok.dtype)
        new_memory = jnp.concatenate([tok[:, None], memory[:, :-1]], axis=1)
        out["rois"] = trajectory_rois[:, 0]
        out["roi_valid"] = roi_valid
        out["memory"] = new_memory
        return out


def generate_trajectory(cur_boxes: jnp.ndarray,
                        prev_boxes: jnp.ndarray) -> jnp.ndarray:
    """Constant-velocity trajectory linking (mppnet_head.generate_trajectory
    :635-659, simplified): each current box's past-frame hypothesis is its
    nearest previous-frame proposal (fallback: the box itself).

    cur_boxes (R, 7), prev_boxes (T-1, P, 7) -> (T, R, 7)."""
    def link(prev):
        d = jnp.sum((cur_boxes[:, None, :2] - prev[None, :, :2]) ** 2, -1)
        idx = jnp.argmin(d, axis=1)
        return prev[idx]

    past = jax.vmap(link)(prev_boxes)              # (T-1, R, 7)
    return jnp.concatenate([cur_boxes[None], past], axis=0)


@register_detector("MPPNet")
def _build_mppnet(cfg):
    return MPPNetDetector(cfg)


@register_detector("MPPNetE2E")
def _build_mppnet_e2e(cfg):
    return MPPNetE2EDetector(cfg)
