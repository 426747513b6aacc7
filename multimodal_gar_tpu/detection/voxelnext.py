"""VoxelNeXt: fully-sparse detector (no dense BEV map, no NMS needed).

Capability parity with pcdet/models/backbones_3d/spconv_backbone_voxelnext.py
(VoxelResBackBone8xVoxelNeXt: residual stages to stride 32, coords of
strides 16/32 rescaled into the stride-8 frame and concatenated, BEV collapse
by summing features over unique (y, x), 2D conv head trunk) and
dense_heads/voxelnext_head.py (sparse CenterPoint-style head: per-active-
voxel class heatmap + regression, gaussian targets on sparse locations,
top-K decode).

TPU-native design: the cross-scale concat is a fixed-width concatenation of
padded sets; the BEV collapse is a fixed-capacity sorted-unique + segment
sum; the "2D sparse convs" run as 3D submanifold convs on a z=1 plane.
The reference's stride-1 SparseConv2d conv_out dilates the active set by
one BEV cell; conv_out here is a true stride-1 sparse conv (kernel
(1, 3, 3)) whose output active set is the dilated one, capped at
``dilate_factor * max_bev_voxels`` sites (lowest linear keys kept — a 3x3
dilation of mb scattered cells can reach 9x mb; raise ``dilate_factor``
for extremely spread-out scenes).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.sparse_backbone import SparseConvBlock, SparseTensor
from ..train import loss_lib
from .dense_heads import _gaussian_radius
from .detectors import DetBatch, DetectorConfig, register_detector
from .sparse_backbones import SparseBasicBlock
from .vfe import mean_vfe


@dataclasses.dataclass(frozen=True)
class VoxelNeXtConfig:
    channels: Tuple[int, ...] = (16, 32, 64, 128, 128)
    out_channel: int = 128
    max_bev_voxels: int = 4000
    # conv_out dilated-set cap as a multiple of max_bev_voxels (a 3x3 BEV
    # dilation can reach 9x for fully scattered cells; 4x covers realistic
    # clustered scenes)
    dilate_factor: int = 4
    gaussian_overlap: float = 0.1
    min_radius: int = 2
    cls_weight: float = 1.0
    loc_weight: float = 0.25
    max_boxes: int = 500


class VoxelNeXtBackbone(nn.Module):
    """Residual encoder to stride 32 + cross-scale sparse BEV collapse."""
    cfg: VoxelNeXtConfig
    max_voxels_per_stage: Tuple[int, ...] = (16000, 16000, 8000, 4000)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = False) -> SparseTensor:
        ch = self.cfg.channels
        caps = self.max_voxels_per_stage
        x = SparseConvBlock(ch[0], "subm", dtype=self.dtype,
                            name="conv_input")(st, train)
        x1 = SparseBasicBlock(ch[0], self.dtype, name="res1_0")(x, train)
        x1 = SparseBasicBlock(ch[0], self.dtype, name="res1_1")(x1, train)

        def stage(x_in, c, cap, idx, pad=1):
            x_ = SparseConvBlock(c, "spconv", stride=2, padding=pad,
                                 max_out_voxels=cap, dtype=self.dtype,
                                 name=f"conv{idx}_down")(x_in, train)
            x_ = SparseBasicBlock(c, self.dtype, name=f"res{idx}_0")(x_, train)
            return SparseBasicBlock(c, self.dtype,
                                    name=f"res{idx}_1")(x_, train)

        x2 = stage(x1, ch[1], caps[1], 2)
        x3 = stage(x2, ch[2], caps[2], 3)
        x4 = stage(x3, ch[3], caps[3], 4)
        x5 = stage(x4, ch[4], max(caps[3] // 2, 1), 5)
        x6 = stage(x5, ch[4], max(caps[3] // 4, 1), 6)

        # lift channels of x4 to ch[4] before summing scales? The reference
        # CONCATENATES along the voxel axis (not channels), so feature dims
        # must match: pad x4's features up to ch[4] with zeros if needed.
        f4 = x4.features
        if f4.shape[-1] < ch[4]:
            f4 = jnp.pad(f4, ((0, 0), (0, 0), (0, ch[4] - f4.shape[-1])))
        # rescale coarse coords into the stride-8 frame (backbone:194-195)
        c5 = x5.coords * 2
        c6 = x6.coords * 4
        all_feats = jnp.concatenate([f4, x5.features, x6.features], axis=1)
        all_coords = jnp.concatenate([x4.coords, c5, c6], axis=1)
        all_valid = jnp.concatenate([x4.valid, x5.valid, x6.valid], axis=1)

        # BEV collapse: sum features over unique (y, x) (bev_out:149-164)
        d, h, w = x4.spatial_shape
        mb = self.cfg.max_bev_voxels

        def collapse(coords, valid, feats):
            key = jnp.where(valid, coords[:, 1] * w + coords[:, 2], -1)
            uniq = jnp.unique(key, size=mb + 1, fill_value=-1)
            uniq = jnp.sort(jnp.where(uniq < 0, jnp.iinfo(jnp.int32).max,
                                      uniq))[:mb]
            uvalid = uniq != jnp.iinfo(jnp.int32).max
            seg = jnp.searchsorted(
                jnp.where(uvalid, uniq, jnp.iinfo(jnp.int32).max), key)
            hit = valid & (seg < mb) \
                & (jnp.take(uniq, jnp.clip(seg, 0, mb - 1)) == key)
            seg = jnp.where(hit, seg, mb)
            summed = jax.ops.segment_sum(feats * hit[:, None], seg,
                                         num_segments=mb + 1)[:mb]
            safe = jnp.where(uvalid, uniq, 0)
            cz = jnp.zeros_like(safe)
            coords2d = jnp.stack([cz, safe // w, safe % w], -1).astype(
                jnp.int32)
            return summed, coords2d, uvalid

        bev_f, bev_c, bev_v = jax.vmap(collapse)(all_coords, all_valid,
                                                 all_feats)
        bev = SparseTensor(features=bev_f, coords=bev_c, valid=bev_v,
                           spatial_shape=(1, h, w))
        # stride-1 sparse conv: output active set = input set dilated by one
        # BEV cell (reference voxelnext.py conv_out, SparseConv2d k3/s1/p1)
        bev = SparseConvBlock(self.cfg.out_channel, "spconv",
                              kernel_size=(1, 3, 3), stride=1,
                              padding=(0, 1, 1),
                              max_out_voxels=self.cfg.dilate_factor * mb,
                              dtype=self.dtype, name="conv_out")(bev, train)
        bev = SparseConvBlock(self.cfg.out_channel, "subm", dtype=self.dtype,
                              name="shared_conv")(bev, train)
        return bev


class VoxelNeXtDetector(nn.Module):
    """VoxelNeXt (voxelnext.py + voxelnext_head.py): sparse heatmap head on
    the collapsed BEV voxel set; NMS-free top-K decode."""
    cfg: DetectorConfig
    vn_cfg: VoxelNeXtConfig = VoxelNeXtConfig()

    @nn.compact
    def __call__(self, batch: DetBatch, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        feats = mean_vfe(batch.voxels, batch.voxel_num_points)
        feats = feats * batch.voxel_valid[..., None].astype(feats.dtype)
        st = SparseTensor(features=feats, coords=batch.voxel_coords,
                          valid=batch.voxel_valid,
                          spatial_shape=c.sparse_shape)
        bev = VoxelNeXtBackbone(self.vn_cfg, c.max_voxels_per_stage,
                                c.compute_dtype, name="backbone_3d")(st,
                                                                     train)
        num_class = len(c.class_names)
        hm = nn.Dense(num_class, name="hm_out",
                      bias_init=nn.initializers.constant(-2.19))(bev.features)
        reg = nn.Dense(8, name="reg_out")(bev.features)   # cxy, z, dim3, rot2
        return {"hm": hm, "reg": reg, "bev_coords": bev.coords,
                "bev_valid": bev.valid}

    def _targets(self, preds, batch: DetBatch):
        """Sparse gaussian heatmap + per-GT nearest-voxel assignment
        (voxelnext_head.assign_target_of_single_head semantics on the
        ACTIVE set instead of a dense map)."""
        c = self.cfg
        vn = self.vn_cfg
        stride = 8
        vx = c.voxel_size[0] * stride
        vy = c.voxel_size[1] * stride

        def per_item(coords, valid, gt, gtc, gtv):
            px = coords[:, 2].astype(jnp.float32)          # x index
            py = coords[:, 1].astype(jnp.float32)
            cx = (gt[:, 0] - c.point_cloud_range[0]) / vx
            cy = (gt[:, 1] - c.point_cloud_range[1]) / vy
            dx = gt[:, 3] / vx
            dy = gt[:, 4] / vy
            radius = jnp.maximum(
                _gaussian_radius(dy, dx, vn.gaussian_overlap).astype(
                    jnp.int32), vn.min_radius).astype(jnp.float32)
            ok = gtv & (gt[:, 3] > 0)
            d2 = (px[None, :] - cx[:, None]) ** 2 \
                + (py[None, :] - cy[:, None]) ** 2          # (G, M)
            sigma = (2 * radius + 1) / 6.0
            g = jnp.exp(-d2 / (2 * sigma[:, None] ** 2))
            trunc = d2 <= (radius[:, None] ** 2) * 2.0
            g = jnp.where(trunc & ok[:, None] & valid[None, :], g, 0.0)
            onehot = jax.nn.one_hot(gtc - 1, len(c.class_names))  # (G, C)
            hm_t = jnp.max(g[:, :, None] * onehot[:, None, :], axis=0)
            # nearest active voxel per GT
            d2m = jnp.where(valid[None, :], d2, jnp.inf)
            nearest = jnp.argmin(d2m, axis=1)               # (G,)
            reg_t = jnp.concatenate([
                (cx - px[nearest])[:, None], (cy - py[nearest])[:, None],
                gt[:, 2:3], jnp.log(jnp.maximum(gt[:, 3:6], 1e-5)),
                jnp.cos(gt[:, 6:7]), jnp.sin(gt[:, 6:7])], -1)
            return hm_t, reg_t, nearest, ok

        return jax.vmap(per_item)(preds["bev_coords"], preds["bev_valid"],
                                  batch.gt_boxes, batch.gt_classes,
                                  batch.gt_valid)

    def loss(self, preds, batch: DetBatch) -> Dict[str, jnp.ndarray]:
        vn = self.vn_cfg
        hm_t, reg_t, nearest, ok = self._targets(preds, batch)
        p = jnp.clip(jax.nn.sigmoid(preds["hm"]), 1e-4, 1 - 1e-4)
        p = p * preds["bev_valid"][..., None].astype(p.dtype)
        hm_loss = loss_lib.gaussian_focal_loss(p, hm_t) * vn.cls_weight
        gathered = jnp.take_along_axis(
            preds["reg"], nearest[..., None].astype(jnp.int32), axis=1)
        m = ok[..., None].astype(gathered.dtype)
        loc = (jnp.abs(gathered - reg_t) * m).sum() \
            / jnp.maximum(m.sum(), 1.0) * vn.loc_weight
        return {"hm_loss": hm_loss, "loc_loss": loc,
                "loss": hm_loss + loc}

    def predict(self, preds) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        stride = 8
        vx = c.voxel_size[0] * stride
        vy = c.voxel_size[1] * stride
        scores_all = jax.nn.sigmoid(preds["hm"]) \
            * preds["bev_valid"][..., None].astype(jnp.float32)
        b, m, nc = scores_all.shape
        k = min(self.vn_cfg.max_boxes, m * nc)
        flat = scores_all.reshape(b, m * nc)
        scores, idx = jax.lax.top_k(flat, k)
        vidx = idx // nc
        cls = (idx % nc) + 1

        def decode(coords, reg, vi):
            px = coords[vi, 2].astype(jnp.float32)
            py = coords[vi, 1].astype(jnp.float32)
            r = reg[vi]
            x = (px + r[:, 0]) * vx + c.point_cloud_range[0]
            y = (py + r[:, 1]) * vy + c.point_cloud_range[1]
            z = r[:, 2]
            dim = jnp.exp(r[:, 3:6])
            rot = jnp.arctan2(r[:, 7], r[:, 6])
            return jnp.concatenate([x[:, None], y[:, None], z[:, None], dim,
                                    rot[:, None]], -1)

        boxes = jax.vmap(decode)(preds["bev_coords"], preds["reg"], vidx)

        # Even the "NMS-free" sparse head can emit duplicates from adjacent
        # active BEV cells of one object; suppress them with the shared
        # fixed-shape class-agnostic NMS (ADVICE r2 medium finding).
        from .post import class_agnostic_nms

        def per_item(sc, bx, lb):
            idx, s, v = class_agnostic_nms(sc, bx, c.nms)
            return bx[idx], s, lb[idx], v

        bx, sc, lb, vd = jax.vmap(per_item)(scores, boxes, cls)
        return {"boxes": bx, "scores": sc,
                "labels": lb * vd.astype(jnp.int32), "valid": vd}


@register_detector("VoxelNeXt")
def _build_voxelnext(cfg):
    return VoxelNeXtDetector(cfg)
