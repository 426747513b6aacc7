"""MPPNet: multi-frame proposal trajectory refinement (+ E2E memory bank).

Capability parity with pcdet/models/detectors/mppnet.py,
roi_heads/mppnet_head.py:298-992, model_utils/mppnet_utils.py and
mppnet_memory_bank_e2e.py: given per-frame proposals from a base detector
(the reference consumes a frozen CenterPoint's 'proposals_list'):

  1. proposals are linked into trajectories by velocity propagation +
     IoU >= 0.5 matching with a per-frame valid_length mask
     (generate_trajectory, mppnet_head.py:635-659);
  2. per-frame points are cropped inside the (enlarged) trajectory boxes
     and stamped with a time channel (crop_*_frame_points:470-549);
  3. raw points get proposal-aware GEOMETRY features — spherical offsets to
     the frame box's 8 corners + center (29-d) through up_dimension_geometry
     (:551-575) — then are pooled onto a 4^3 PROXY-POINT grid per
     (frame, box) by a multi-radius StackSAModuleMSG (roi_grid_pool:403-442);
  4. proxy points get MOTION features — spherical offsets to the
     CURRENT-frame box + per-frame time embedding (30-d) through
     up_dimension_motion (:577-606) — summed with the geometry stream;
  5. a grouped transformer (mppnet_utils.Transformer:155-262) runs
     num_groups streams of [learnable token | proxy tokens]: each encoder
     layer applies a per-axis MLP-mixer over the proxy grid
     (SpatialMixerBlock:109-154), a token<-points attention summary, and —
     on all but the last layer — inter-group cross-attention against a
     4-group fusion MLP (TransformerEncoderLayer:302-345);
  6. a PointNet auxiliary branch embeds the canonicalized box sequence
     (trajectories_auxiliary_branch:608-633) into box_reg + box_feat;
  7. heads: per-layer class logits from the group-0 token, per-layer
     per-group box residuals (bbox_embed), and the final joint regression
     from [all group tokens | box_feat] (jointembed, forward:774-788).

TPU-native design: everything is fixed-shape — K cropped points per
(frame, RoI) via ops/boxes3d.roipoint_pool3d under a (batch x frame) vmap,
G x (1 + P) tokens per RoI stacked on a leading group axis, one dense
grouped transformer. Frame->group assignment is the reference's
sequence-stride interleave (group i takes frames i, i+G, ...). The E2E
variant threads the per-frame summary memory as explicit functional state
instead of an in-module python list (mppnet_memory_bank_e2e.py).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.layers import MaskedBatchNorm
from ..ops import boxes3d
from ..ops.geometry import rotate_points_along_z, safe_sqrt
from ..ops.neighbor import ball_query, grouping_operation
from .box_coders import ResidualCoder
from .detectors import DetectorConfig, register_detector
from .post import post_processing
from .roi_heads import canonical_gt_transform, decode_roi_boxes, roi_box_loss, \
    roi_cls_loss


@dataclasses.dataclass(frozen=True)
class MPPNetConfig:
    num_frames: int = 4
    num_groups: int = 4                  # G | num_frames; groups interleave
    points_per_roi: int = 128            # cropped points per (frame, RoI)
    proxy_grid: int = 4                  # 4^3 = 64 proxy points per frame
    hidden: int = 64
    num_heads: int = 4
    num_layers: int = 2                  # encoder layers
    mixer_hidden: int = 16
    pool_radii: Tuple[float, ...] = (0.8, 1.6)
    pool_nsamples: Tuple[int, ...] = (16, 16)
    pool_extra_width: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    cls_fg_thresh: float = 0.75
    cls_bg_thresh: float = 0.25
    aux_weight: float = 1.0              # per-layer point/box aux losses
    traj_iou_thresh: float = 0.5         # generate_trajectory matching


def corner_proxy_points(rois: jnp.ndarray) -> jnp.ndarray:
    """(R, 7) -> (R, 9, 3): 8 corners + center
    (mppnet_head.get_corner_points_of_roi:367-401)."""
    corners = boxes3d.boxes_to_corners_3d(rois)              # (R, 8, 3)
    return jnp.concatenate([corners, rois[:, None, :3]], axis=1)


def dense_proxy_points(rois: jnp.ndarray, grid: int) -> jnp.ndarray:
    """(R, 7) -> (R, grid^3, 3) global grid points
    (get_proxy_points_of_roi:444-452 via get_dense_grid_points)."""
    g = jnp.arange(grid, dtype=rois.dtype)
    gx, gy, gz = jnp.meshgrid(g, g, g, indexing="ij")
    idx = jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)    # (G3, 3)
    local = (idx[None] + 0.5) / grid * rois[:, None, 3:6] \
        - rois[:, None, 3:6] / 2
    local = rotate_points_along_z(local, rois[:, 6])
    return local + rois[:, None, :3]


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


def proposal_aware_feature(points_xyz: jnp.ndarray, rois: jnp.ndarray
                           ) -> jnp.ndarray:
    """Spherical offsets of each point to a box's 9 proxy points -> (..., 27).

    points_xyz: (R, K, 3); rois: (R, 7).
    """
    proxies = corner_proxy_points(rois)                      # (R, 9, 3)
    # safe_sqrt: padded ROI rows have all-zero dims (CLAUDE.md convention)
    diag = safe_sqrt(jnp.sum(rois[:, 3:6] ** 2, axis=-1))    # (R,)
    off = points_xyz[:, :, None, :] - proxies[:, None, :, :]  # (R, K, 9, 3)
    sph = spherical_coordinate(off, diag[:, None, None])
    return sph.reshape(points_xyz.shape[0], points_xyz.shape[1], 27)


class MLPStack(nn.Module):
    """mppnet_utils.MLP: num_layers Dense with ReLU between."""
    hidden: int
    out: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden, name=f"fc{i}")(x))
        return nn.Dense(self.out, name=f"fc{self.num_layers - 1}")(x)


class FFNBlock(nn.Module):
    """mppnet_utils.FFN: residual add + LN + feedforward + LN."""
    hidden: int

    @nn.compact
    def __call__(self, tgt: jnp.ndarray, tgt_input: jnp.ndarray) -> jnp.ndarray:
        tgt = nn.LayerNorm(name="ln1")(tgt + tgt_input)
        ff = nn.Dense(self.hidden * 2, name="ff1")(tgt)
        ff = nn.Dense(tgt.shape[-1], name="ff2")(nn.relu(ff))
        return nn.LayerNorm(name="ln2")(tgt + ff)


class SpatialMixerBlock(nn.Module):
    """Per-axis MLP mixer over the proxy grid (mppnet_utils:109-154)."""
    grid: int
    mixer_hidden: int

    @nn.compact
    def __call__(self, src: jnp.ndarray) -> jnp.ndarray:
        """src: (..., grid^3, C) proxy tokens in (x, y, z) scan order."""
        g = self.grid
        c = src.shape[-1]
        lead = src.shape[:-2]
        x = src.reshape(lead + (g, g, g, c))
        for ax, name in zip(range(len(lead), len(lead) + 3),
                            ("mix_x", "mix_y", "mix_z")):
            moved = jnp.moveaxis(x, ax, -1)                  # (..., C, g)
            mixed = MLPStack(self.mixer_hidden, g, 3, name=name)(moved)
            x = x + jnp.moveaxis(mixed, -1, ax)
            x = nn.LayerNorm(name=f"{name}_ln")(x)
        x = x.reshape(lead + (g ** 3, c))
        ff = nn.Dense(2 * c, name="ffn1")(x)
        ff = nn.Dense(c, name="ffn2")(nn.relu(ff))
        return nn.LayerNorm(name="ffn_ln")(x + ff)


class PointNetSeq(nn.Module):
    """mppnet_utils.PointNet over the canonical box sequence:
    pointwise conv stack + BN, max over T -> (box_reg, box_feat)."""
    hidden: int

    @nn.compact
    def __call__(self, box_seq: jnp.ndarray, valid: jnp.ndarray,
                 train: bool = False):
        """box_seq: (N, T, 8); valid: (N,) real-ROI mask.
        Returns reg (N, 7), feat (N, 4*hidden)."""
        h = box_seq
        for i, ch in enumerate((self.hidden, 2 * self.hidden,
                                4 * self.hidden, 4 * self.hidden)):
            h = nn.Dense(ch, use_bias=False, name=f"conv{i}")(h)
            # stats masked to real ROI rows (CLAUDE.md convention)
            h = MaskedBatchNorm(momentum=0.99, epsilon=1e-3,
                                name=f"bn{i}")(
                h, mask=jnp.broadcast_to(valid[:, None], h.shape[:-1]),
                use_running_average=not train)
            h = nn.relu(h)
        feat = jnp.max(h, axis=1)                            # (N, 4H)
        reg = nn.Dense(self.hidden, name="reg_fc")(feat)
        reg = nn.Dense(7, name="reg_out",
                       kernel_init=nn.initializers.normal(0.001))(
            nn.relu(reg))
        return reg, feat


class GroupedEncoderLayer(nn.Module):
    """mppnet_utils.TransformerEncoderLayer.forward_post (:302-345)."""
    cfg: MPPNetConfig
    last: bool

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, points: jnp.ndarray):
        """tokens (G, N, 1, H); points (G, N, P, H)."""
        c = self.cfg
        g, n, p, h = points.shape
        mixed = SpatialMixerBlock(c.proxy_grid, c.mixer_hidden,
                                  name="mixer")(points)
        summary = nn.MultiHeadDotProductAttention(
            num_heads=c.num_heads, name="token_att")(tokens, mixed, mixed)
        tokens = nn.LayerNorm(name="tok_ln1")(tokens + summary)
        ff = nn.Dense(2 * h, name="tok_ff1")(tokens)
        ff = nn.Dense(h, name="tok_ff2")(nn.relu(ff))
        tokens = nn.LayerNorm(name="tok_ln2")(tokens + ff)

        if not self.last:
            # inter-group fusion: every group cross-attends a 4-group MLP
            # fusion of the point tokens (mppnet_utils:325-341)
            allg = jnp.concatenate([mixed[i] for i in range(g)], -1)
            fused = MLPStack(h, h, 4, name="fusion_all")(allg)  # (N, P, H)
            # ONE shared FFN across groups (the reference's
            # TransformerEncoderLayer reuses self.ffn in its cross-attention
            # loop, mppnet_utils.py:325-341)
            ffn = FFNBlock(2 * h, name="ffn")
            outs = []
            for i in range(g):
                ca = nn.MultiHeadDotProductAttention(
                    num_heads=c.num_heads, name=f"cross{i}")(
                    mixed[i], fused, fused)
                outs.append(ffn(mixed[i], ca))
            points = jnp.stack(outs, 0)
        else:
            points = mixed
        return tokens, points


class MPPNetHead(nn.Module):
    """Grouped-transformer trajectory refinement head."""
    cfg: MPPNetConfig

    @nn.compact
    def __call__(self, frame_points: jnp.ndarray, point_valid: jnp.ndarray,
                 trajectory_rois: jnp.ndarray, roi_valid: jnp.ndarray,
                 traj_valid: Optional[jnp.ndarray] = None,
                 geo_memory: Optional[jnp.ndarray] = None,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        """
        Args:
          frame_points: (B, T_pts, N, 4) per-frame points (current frame
            first). T_pts == T, or 1 in the E2E online mode;
          point_valid: (B, T_pts, N);
          trajectory_rois: (B, T, R, 7) the proposal trajectory;
          roi_valid: (B, R);
          traj_valid: (B, T, R) per-frame trajectory validity (valid_length);
          geo_memory: (B, T-1, R, P, H) cached per-step proxy GEOMETRY
            features for the past frames (mppnet_memory_bank_e2e.py
            feature_bank, aligned to the trajectory rows). Required when
            T_pts < T; frames with traj_valid False fall back to a repeat
            of the current frame's features (reference :447-462).
        Returns rcnn_cls (B, R), joint_reg (B, R, 7), aux heads, summaries.
        """
        c = self.cfg
        b, t_pts, n, _ = frame_points.shape
        t, r = trajectory_rois.shape[1:3]
        grp = min(c.num_groups, t)
        assert t % grp == 0, (t, grp)
        glen = t // grp
        p3 = c.proxy_grid ** 3
        if traj_valid is None:
            traj_valid = jnp.broadcast_to(roi_valid[:, None, :], (b, t, r))

        def crop(pts, pv, rois):
            enlarged = boxes3d.enlarge_box3d(rois, c.pool_extra_width)
            park = jnp.where(pv[:, None], pts[:, :3], 1e6)
            pooled, empty = boxes3d.roipoint_pool3d(
                park, pts[:, 3:], enlarged,
                num_sampled_points=c.points_per_roi)
            return pooled, empty                     # (R, K, 3+C), (R,)

        pooled, empty = jax.vmap(jax.vmap(crop))(
            frame_points, point_valid, trajectory_rois[:, :t_pts])
        # time channel (crop_*_frame_points: src[..., 4] = i * 0.1)
        tstamp = (0.1 * jnp.arange(t_pts))[None, :, None, None, None]
        pooled = jnp.concatenate(
            [pooled, jnp.broadcast_to(tstamp, pooled.shape[:-1] + (1,))], -1)
        live = ((~empty) & traj_valid[:, :t_pts])[..., None, None]
        pooled = pooled * live.astype(pooled.dtype)

        # --- geometry on raw points: 27 spherical + extra channels -> H ---
        btp = b * t_pts * r
        rois_bt = trajectory_rois[:, :t_pts].reshape(btp, 7)
        pts_bt = pooled.reshape(btp, c.points_per_roi, -1)
        geo = proposal_aware_feature(pts_bt[..., :3], rois_bt)
        geo = jnp.concatenate([geo, pts_bt[..., 3:]], -1)    # (BTpR, K, 29)
        nrad = len(c.pool_radii)
        geo = MLPStack(64, c.hidden // nrad, 3,
                       name="up_dim_geometry")(geo)

        # --- pool onto the proxy grid per (frame, box) ---------------------
        # inline StackSAModuleMSG (roi_grid_pool:403-442): multi-radius ball
        # query + relative-xyz concat + shared MLP + max. BN runs over the
        # whole (BTR, P, S) extent natively, so no module-level vmap.
        proxies_all = dense_proxy_points(
            trajectory_rois.reshape(b * t * r, 7), c.proxy_grid)  # (BTR,P,3)
        proxies = proxies_all.reshape(b, t, r, p3, 3)[:, :t_pts].reshape(
            btp, p3, 3)
        pts_xyz = pts_bt[..., :3]
        pvalid = jnp.broadcast_to(
            live.reshape(btp, 1), (btp, c.points_per_roi))
        pooled_scales = []
        for i, (rad, ns) in enumerate(zip(c.pool_radii, c.pool_nsamples)):
            idx, qempty = jax.vmap(
                lambda x, q, v: ball_query(rad, ns, x, q, v))(
                pts_xyz, proxies, pvalid)                    # (BTpR, P, ns)
            gx = jax.vmap(grouping_operation)(pts_xyz, idx) \
                - proxies[:, :, None, :]
            gf = jax.vmap(grouping_operation)(geo, idx)
            h = jnp.concatenate([gx, gf], -1)
            h = nn.Dense(c.hidden // nrad, use_bias=False,
                         name=f"pool_mlp{i}")(h)
            # stats masked to live (frame, roi) crops (CLAUDE.md convention)
            h = MaskedBatchNorm(momentum=0.99, epsilon=1e-3,
                                name=f"pool_bn{i}")(
                h, mask=jnp.broadcast_to(pvalid[:, :1, None],
                                         h.shape[:-1]),
                use_running_average=not train)
            h = jnp.max(nn.relu(h), axis=2)
            pooled_scales.append(
                h * (~qempty)[..., None].astype(h.dtype))
        proxy_feat = jnp.concatenate(pooled_scales, -1)      # (BTpR, P, H)
        proxy_feat = proxy_feat.reshape(b, t_pts, r, p3, c.hidden)

        if t_pts < t:
            # online mode: past frames' GEOMETRY features come from the
            # memory bank; unmatched frames repeat the current frame's
            # (mppnet_memory_bank_e2e.py:447-462)
            assert geo_memory is not None and geo_memory.shape[1] == t - 1
            cur = proxy_feat[:, 0]                           # (B, R, P, H)
            past = jnp.where(traj_valid[:, 1:, :, None, None],
                             geo_memory, cur[:, None])
            geo_all = jnp.concatenate([proxy_feat, past], axis=1)
        else:
            # offline mode: trajectory-invalid frames fall back to a REPEAT
            # of the current frame's proxy features — matching the
            # reference's crops (mppnet_head.py crop_current_frame_points
            # repeats src over T; crop_previous_frame_points only overwrites
            # frames with a valid trajectory) and this module's own E2E
            # online fallback above, so a model trained offline sees the
            # same invalid-frame features when later run online.
            cur = proxy_feat[:, :1]                          # (B, 1, R, P, H)
            geo_all = jnp.where(traj_valid[:, :, :, None, None],
                                proxy_feat, cur)             # (B, T, R, P, H)
        geo_bank = geo_all[:, 0]                             # for the bank

        # --- motion on proxy points: offsets to the CURRENT box + time ----
        cur_rois = jnp.broadcast_to(
            trajectory_rois[:, :1], (b, t, r, 7)).reshape(b * t * r, 7)
        msph = proposal_aware_feature(proxies_all, cur_rois)
        tpad = jnp.zeros(msph.shape[:-1] + (2,))
        tch = jnp.broadcast_to(
            (0.1 * jnp.arange(t))[None, :, None, None, None],
            (b, t, r, p3, 1)).reshape(b * t * r, p3, 1)
        motion = MLPStack(64, c.hidden, 3, name="up_dim_motion")(
            jnp.concatenate([msph, tpad, tch], -1))          # (BTR, P, H)

        src = (geo_all.reshape(b * t * r, p3, c.hidden) + motion) \
            .reshape(b, t, r, p3, c.hidden)
        # per-ROI masking only (reference USE_TRAJ_EMPTY_MASK zeroes src for
        # empty ROIs; invalid FRAMES carry the repeated current-frame proxy
        # features substituted above — identically in the offline and E2E
        # online paths)
        src = src * roi_valid[:, None, :, None, None].astype(src.dtype)
        frame_summary = jnp.max(src, axis=3)                 # (B, T, R, H)

        # --- grouping: sequence-stride interleave (frames i, i+G, ...) ----
        src = jnp.swapaxes(src, 1, 2).reshape(b * r, t, p3, c.hidden)
        groups = src.reshape(b * r, glen, grp, p3, c.hidden)  # frame = l*G+g
        groups = jnp.moveaxis(groups, 2, 0)                  # (G, N, L, P, H)
        if glen > 1:
            merged = jnp.moveaxis(groups, 2, -2).reshape(
                grp, b * r, p3, glen * c.hidden)
            fused = MLPStack(c.hidden, c.hidden, 4,
                             name="fusion_all_group")(merged)
            points = FFNBlock(2 * c.hidden, name="fusion_norm")(
                groups[:, :, 0], fused)                      # (G, N, P, H)
        else:
            points = groups[:, :, 0]

        gtok = self.param("group_tokens", nn.initializers.zeros,
                          (grp, 1, 1, c.hidden))
        tokens = jnp.broadcast_to(gtok, (grp, b * r, 1, c.hidden))

        tok_layers = []
        for i in range(c.num_layers):
            tokens, points = GroupedEncoderLayer(
                c, last=(i == c.num_layers - 1), name=f"enc{i}")(
                tokens, points)
            tok_layers.append(tokens[:, :, 0])               # (G, N, H)

        # --- auxiliary box-sequence branch ---------------------------------
        tstamp_b = jnp.broadcast_to(
            (0.1 * jnp.arange(t))[None, :, None, None], (b, t, r, 1))
        box_seq = jnp.concatenate(
            [trajectory_rois[..., :7], tstamp_b], -1)        # (B, T, R, 8)
        box_seq = box_seq.at[..., 0:3].set(
            box_seq[..., 0:3] - box_seq[:, 0:1, :, 0:3])
        ry0 = trajectory_rois[:, 0, :, 6]                    # (B, R)
        seq = jnp.swapaxes(box_seq, 1, 2).reshape(b * r, t, 8)
        rot = rotate_points_along_z(seq[..., :3], -ry0.reshape(b * r))
        seq = jnp.concatenate([rot, seq[..., 3:]], -1)
        seq = seq.at[..., 6].set(0.0)
        box_reg, box_feat = PointNetSeq(c.hidden, name="seqboxembed")(
            seq, roi_valid.reshape(b * r), train)            # (N,7),(N,4H)

        # --- heads (class/bbox embeds SHARED across layers, reference
        # class_embed[0] / bbox_embed[group]) -------------------------------
        cls_head = nn.Dense(1, name="class_embed")
        bbox_heads = [MLPStack(c.hidden, 7, 4, name=f"bbox_embed{g}")
                      for g in range(grp)]
        point_cls = jnp.stack(
            [cls_head(tl[0])[..., 0] for tl in tok_layers], 0)  # (L, N)
        point_reg = jnp.stack(
            [jnp.stack([bbox_heads[g](tl[g]) for g in range(grp)], 0)
             for tl in tok_layers], 0)                       # (L, G, N, 7)
        hs = jnp.concatenate([tok_layers[-1][g] for g in range(grp)], -1)
        joint_reg = MLPStack(c.hidden, 7, 4, name="jointembed")(
            jnp.concatenate([hs, box_feat], -1))             # (N, 7)

        valid = roi_valid.reshape(b * r).astype(joint_reg.dtype)
        shape_br = (b, r)
        out = {
            "rcnn_cls": (point_cls[-1] * valid).reshape(shape_br),
            "rcnn_cls_layers": point_cls * valid[None],
            "point_reg": point_reg * valid[None, None, :, None],
            "box_reg": (box_reg * valid[:, None]).reshape(b, r, 7),
            "rcnn_reg": (joint_reg * valid[:, None]).reshape(b, r, 7),
            "frame_tokens": jnp.swapaxes(frame_summary, 1, 2),  # (B,R,T,H)
            # current-frame proxy GEOMETRY features, the E2E bank entry
            # (reference batch_dict['geometory_feature_memory'])
            "geo_memory_out": geo_bank,                      # (B, R, P, H)
        }
        return out


class MPPNetDetector(nn.Module):
    """mppnet.py topology on precomputed per-frame proposals: trajectory
    refinement only (the base single-frame detector is any zoo member)."""
    cfg: DetectorConfig
    mp_cfg: MPPNetConfig = MPPNetConfig()

    @nn.compact
    def __call__(self, frame_points, point_valid, trajectory_rois, roi_valid,
                 traj_valid=None, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        out = MPPNetHead(self.mp_cfg, name="head")(
            frame_points, point_valid, trajectory_rois, roi_valid,
            traj_valid=traj_valid, train=train)
        out["rois"] = trajectory_rois[:, 0]
        out["roi_valid"] = roi_valid
        return out

    def loss(self, preds, gt_boxes, gt_classes, gt_valid
             ) -> Dict[str, jnp.ndarray]:
        """IoU-guided confidence (per encoder layer) + canonical box
        regression on the joint head, with point/box auxiliary terms
        (mppnet_head.get_loss:801-960)."""
        c = self.mp_cfg
        coder = ResidualCoder()
        rois = preds["rois"]
        b, r = rois.shape[:2]
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
        # per-layer supervision of the token class logits (get_box_cls_
        # layer_loss repeats the targets over enc layers)
        layers = preds["rcnn_cls_layers"]                      # (L, B*R)
        cls_loss = sum(roi_cls_loss(layers[i], cls_t.reshape(-1))
                       for i in range(layers.shape[0])) / layers.shape[0]
        gt_ct = jax.vmap(canonical_gt_transform)(rois, gt_of)
        reg_fg = (best > 0.55) & preds["roi_valid"]
        reg = roi_box_loss(coder, flat(preds["rcnn_reg"]), flat(rois),
                           flat(gt_ct), flat(gt_of), flat(reg_fg))
        # auxiliary regressions: per-layer per-group tokens + the box-
        # sequence branch (get_box_reg_layer_loss aux terms)
        aux = 0.0
        pr = preds["point_reg"]                                # (L, G, BR, 7)
        naux = pr.shape[0] * pr.shape[1] + 1
        for i in range(pr.shape[0]):
            for g in range(pr.shape[1]):
                aux = aux + roi_box_loss(
                    coder, pr[i, g], flat(rois), flat(gt_ct), flat(gt_of),
                    flat(reg_fg))["rcnn_loss_reg_total"]
        aux = aux + roi_box_loss(
            coder, flat(preds["box_reg"]), flat(rois), flat(gt_ct),
            flat(gt_of), flat(reg_fg))["rcnn_loss_reg_total"]
        aux = aux / naux
        total = cls_loss + reg["rcnn_loss_reg_total"] + c.aux_weight * aux
        return {"rcnn_loss_cls": cls_loss,
                "rcnn_loss_reg": reg["rcnn_loss_reg"],
                "rcnn_loss_aux": aux,
                "loss": total}

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
    """mppnet_e2e.py: online variant with a rolling per-step feature bank
    threaded as functional state (bank in, bank out).

    The bank holds each past step's current-frame proxy GEOMETRY features
    (reference feature_bank / geometory_feature_memory); at each step only
    the CURRENT frame's points are cropped and pooled — past frames reuse
    their banked features, aligned to the trajectory rows by the caller
    (generate_trajectory's matching; identity when ROI slots track)."""

    @nn.compact
    def __call__(self, frame_points, point_valid, trajectory_rois, roi_valid,
                 memory: Optional[jnp.ndarray] = None, traj_valid=None,
                 memory_valid: Optional[jnp.ndarray] = None,
                 train: bool = False):
        t = trajectory_rois.shape[1]
        b, r = roi_valid.shape
        online = frame_points.shape[1] < t
        if memory is None:
            memory = jnp.zeros((b, t - 1, r, self.mp_cfg.proxy_grid ** 3,
                                self.mp_cfg.hidden), jnp.float32)
            if memory_valid is None:
                memory_valid = jnp.zeros((b, t - 1, r), bool)
        elif memory_valid is None:
            # bank supplied without validity: assume every slot written
            memory_valid = jnp.broadcast_to(roi_valid[:, None, :],
                                            (b, t - 1, r))
        if online and traj_valid is None:
            # never consume never-written bank slots as real frames; the
            # head repeats the current frame's features there instead
            traj_valid = jnp.concatenate(
                [roi_valid[:, None, :], memory_valid], axis=1)
        if not online:
            # offline parity path: all frames cropped, bank ignored
            out = MPPNetHead(self.mp_cfg, name="head")(
                frame_points, point_valid, trajectory_rois, roi_valid,
                traj_valid=traj_valid, train=train)
        else:
            out = MPPNetHead(self.mp_cfg, name="head")(
                frame_points[:, :1], point_valid[:, :1], trajectory_rois,
                roi_valid, traj_valid=traj_valid, geo_memory=memory,
                train=train)
        out["rois"] = trajectory_rois[:, 0]
        out["roi_valid"] = roi_valid
        out["memory"] = jnp.concatenate(
            [out["geo_memory_out"][:, None], memory[:, :-1]], axis=1)
        out["memory_valid"] = jnp.concatenate(
            [roi_valid[:, None, :], memory_valid[:, :-1]], axis=1)
        return out


def generate_trajectory(cur_boxes: jnp.ndarray,
                        prev_boxes: jnp.ndarray,
                        iou_thresh: float = 0.5
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Velocity-propagated trajectory linking (mppnet_head.generate_
    trajectory:635-659): frame i's hypothesis is frame i-1's trajectory box
    advanced by its own velocity (columns 7:9 when present); the best-IoU
    previous-frame proposal replaces the trajectory entry when
    IoU >= iou_thresh, else the entry KEEPS the current-frame box (the
    reference's initialization — the advanced hypothesis is only a probe,
    so misses do not compound the velocity) and the frame is marked
    invalid in valid_length.

    cur_boxes (R, C>=7), prev_boxes (T-1, P, C>=7) ->
    trajectory (T, R, C), valid_length (T, R) bool.
    """
    t1 = prev_boxes.shape[0]
    r = cur_boxes.shape[0]
    has_vel = cur_boxes.shape[-1] >= 9

    def step(traj_prev, props):
        hyp = traj_prev
        if has_vel:
            hyp = hyp.at[:, 0:2].add(traj_prev[:, 7:9])
        iou = boxes3d.boxes_iou3d(hyp[:, :7], props[:, :7])  # (R, P)
        best = iou.max(axis=1)
        idx = iou.argmax(axis=1)
        matched = best >= iou_thresh
        nxt = jnp.where(matched[:, None], props[idx], cur_boxes)
        return nxt, (nxt, matched)

    _, (frames, valids) = jax.lax.scan(step, cur_boxes, prev_boxes)
    traj = jnp.concatenate([cur_boxes[None], frames], axis=0)
    valid = jnp.concatenate(
        [jnp.ones((1, r), bool), valids], axis=0)
    return traj, valid


@register_detector("MPPNet")
def _build_mppnet(cfg):
    return MPPNetDetector(cfg)


@register_detector("MPPNetE2E")
def _build_mppnet_e2e(cfg):
    return MPPNetE2EDetector(cfg)
