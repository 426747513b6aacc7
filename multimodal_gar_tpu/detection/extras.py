"""Remaining zoo capability modules: multi-head RPN, dynamic pillar VFE,
FPN-input BEV trunk, 2D sparse pillar backbone, focal sparse conv.

Capability parity with:
  - AnchorHeadMulti (dense_heads/anchor_head_multi.py:9-373): per-class-group
    RPN heads with their own small conv trunks and anchor sets
    (SEPARATE_MULTIHEAD semantics — each head scores only its classes).
  - DynamicPillarVFE (backbones_3d/vfe/dynamic_pillar_vfe.py): PFN directly
    on raw points with per-pillar segment max (no host voxelizer pass).
  - BaseBEVBackboneV1 (backbones_2d/base_bev_backbone.py:115+): the variant
    consuming multi-scale inputs instead of one canvas.
  - PillarRes18BackBone8x (backbones_3d/spconv_backbone_2d.py): residual 2D
    sparse pillar backbone, expressed on z=1 SparseTensors.
  - FocalSparseConv (backbones_3d/focal_sparse_conv/focal_sparse_conv.py):
    learned voxel-importance gating; here as multiplicative sigmoid gating
    plus a static top-k re-selection of the active set.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.sparse_backbone import (SparseConvBlock, SparseTensor,
                                      SubMConv3d, _neighbor_idx_subm)
from .anchors import AnchorClassConfig
from .box_coders import ResidualCoder
from .dense_heads import AnchorHeadConfig, AnchorHeadSingle, anchor_head_loss, \
    decode_anchor_preds
from .sparse_backbones import SparseBasicBlock
from .target_assign import build_anchor_set


class AnchorHeadMulti(nn.Module):
    """Grouped multi-head RPN. Each head owns a subset of classes, a small
    conv trunk, and its own anchor set; losses sum over heads and decoded
    predictions concatenate over the anchor axis."""
    head_cfg: AnchorHeadConfig
    class_groups: Tuple[Tuple[str, ...], ...]
    anchors: Tuple[AnchorClassConfig, ...]
    grid_size: Tuple[int, int]
    point_cloud_range: Tuple[float, ...]
    shared_channels: int = 64
    code_size: int = 7

    def _group_sets(self):
        by_name = {a.class_name: a for a in self.anchors}
        return [build_anchor_set(tuple(by_name[n] for n in grp),
                                 self.grid_size, self.point_cloud_range)
                for grp in self.class_groups]

    @nn.compact
    def __call__(self, bev: jnp.ndarray) -> Dict[str, Any]:
        x = nn.Conv(self.shared_channels, (3, 3), use_bias=False,
                    name="shared_conv")(bev)
        x = nn.relu(x)
        sets = self._group_sets()
        heads = []
        for i, (grp, aset) in enumerate(zip(self.class_groups, sets)):
            cfg = dataclasses.replace(self.head_cfg, num_class=len(grp))
            heads.append(AnchorHeadSingle(
                cfg, aset.num_per_loc, self.code_size,
                name=f"head_{i}")(x))
        return {"heads": heads}

    def loss(self, preds, gt_boxes, gt_classes, gt_valid,
             class_names: Sequence[str]):
        sets = self._group_sets()
        coder = ResidualCoder(
            encode_angle_by_sincos=self.head_cfg.encode_angle_by_sincos)
        total = None
        out = {}
        for i, (grp, aset, hp) in enumerate(zip(self.class_groups, sets,
                                                preds["heads"])):
            # remap global class ids into this head's local 1..len(grp)
            gid = jnp.zeros_like(gt_classes)
            for local, name in enumerate(grp):
                gidx = class_names.index(name) + 1
                gid = jnp.where(gt_classes == gidx, local + 1, gid)
            cfg = dataclasses.replace(self.head_cfg, num_class=len(grp))
            li = anchor_head_loss(hp, aset, coder, cfg, gt_boxes, gid,
                                  gt_valid & (gid > 0))
            out[f"head{i}_rpn_loss"] = li["rpn_loss"]
            total = li["rpn_loss"] if total is None \
                else total + li["rpn_loss"]
        out["rpn_loss"] = total
        return out

    def decode(self, preds, class_names: Sequence[str]):
        """-> (cls (B, N, num_all_classes) with global class slots,
        boxes (B, N, 7)) concatenated over heads."""
        sets = self._group_sets()
        coder = ResidualCoder(
            encode_angle_by_sincos=self.head_cfg.encode_angle_by_sincos)
        cls_all, box_all = [], []
        n_cls = len(class_names)
        for grp, aset, hp in zip(self.class_groups, sets, preds["heads"]):
            cfg = dataclasses.replace(self.head_cfg, num_class=len(grp))
            cls, boxes = decode_anchor_preds(hp, aset, coder, cfg)
            full = jnp.full(cls.shape[:2] + (n_cls,), -1e4, cls.dtype)
            for local, name in enumerate(grp):
                full = full.at[..., class_names.index(name)].set(
                    cls[..., local])
            cls_all.append(full)
            box_all.append(boxes)
        return jnp.concatenate(cls_all, 1), jnp.concatenate(box_all, 1)


class DynamicPillarVFE(nn.Module):
    """PFN over raw points with per-pillar segment max
    (dynamic_pillar_vfe.py). Returns fixed-capacity pillar features +
    zyx coords + validity, ready for pillar_scatter."""
    num_filters: Tuple[int, ...] = (64,)
    voxel_size: Tuple[float, float, float] = (0.16, 0.16, 4.0)
    point_cloud_range: Tuple[float, ...] = (0., -39.68, -3., 69.12, 39.68, 1.)
    max_pillars: int = 4096

    @nn.compact
    def __call__(self, points: jnp.ndarray, point_valid: jnp.ndarray,
                 train: bool = False):
        pr = self.point_cloud_range
        vx, vy = self.voxel_size[0], self.voxel_size[1]
        nx = int(round((pr[3] - pr[0]) / vx))
        ny = int(round((pr[4] - pr[1]) / vy))
        mp = self.max_pillars

        def keys_item(pts, pv):
            ix = jnp.floor((pts[:, 0] - pr[0]) / vx).astype(jnp.int32)
            iy = jnp.floor((pts[:, 1] - pr[1]) / vy).astype(jnp.int32)
            inb = (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny) & pv
            key = jnp.where(inb, iy * nx + ix, -1)
            uniq = jnp.unique(key, size=mp + 1, fill_value=-1)
            uniq = jnp.sort(jnp.where(uniq < 0, jnp.iinfo(jnp.int32).max,
                                      uniq))[:mp]
            uvalid = uniq != jnp.iinfo(jnp.int32).max
            seg = jnp.searchsorted(
                jnp.where(uvalid, uniq, jnp.iinfo(jnp.int32).max), key)
            hit = inb & (seg < mp) \
                & (jnp.take(uniq, jnp.clip(seg, 0, mp - 1)) == key)
            seg = jnp.where(hit, seg, mp)
            return seg, hit, uniq, uvalid

        seg, hit, uniq, uvalid = jax.vmap(keys_item)(points, point_valid)

        # decorate: [p, p - pillar_mean, p_xy - pillar_center]
        def mean_item(pts, sg, ht):
            s = jax.ops.segment_sum(pts[:, :3] * ht[:, None], sg,
                                    num_segments=mp + 1)
            n = jax.ops.segment_sum(ht.astype(pts.dtype), sg,
                                    num_segments=mp + 1)
            mean = s / jnp.maximum(n, 1.0)[:, None]
            return mean[jnp.clip(sg, 0, mp)], n[:mp]

        means, _ = jax.vmap(mean_item)(points, seg, hit)
        safe = jnp.where(uvalid, uniq, 0)
        cx = (safe % nx).astype(jnp.float32) * vx + vx / 2 + pr[0]
        cy = (safe // nx).astype(jnp.float32) * vy + vy / 2 + pr[1]
        ctr = jnp.stack([cx, cy], -1)                        # (B, mp, 2)
        ctr_of_pt = jnp.take_along_axis(
            ctr, jnp.clip(seg, 0, mp - 1)[..., None], axis=1)
        feats = jnp.concatenate(
            [points, points[..., :3] - means,
             points[..., :2] - ctr_of_pt], -1)
        feats = feats * hit[..., None].astype(feats.dtype)

        for i, ch in enumerate(self.num_filters):
            feats = nn.Dense(ch, use_bias=False, name=f"pfn{i}")(feats)
            feats = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                                 name=f"pfn{i}_bn")(feats)
            feats = nn.relu(feats) * hit[..., None].astype(feats.dtype)
            if i < len(self.num_filters) - 1:
                mx = jax.vmap(lambda f, sg: jax.ops.segment_max(
                    f, sg, num_segments=mp + 1)[jnp.clip(sg, 0, mp)])(
                    feats, seg)
                feats = jnp.concatenate([feats, mx], -1)

        def pool_item(f, sg):
            pooled = jax.ops.segment_max(
                jnp.where(jnp.isfinite(f), f, -jnp.inf), sg,
                num_segments=mp + 1)[:mp]
            return jnp.where(jnp.isfinite(pooled), pooled, 0.0)

        pillar = jax.vmap(pool_item)(feats, seg)
        coords = jnp.stack([jnp.zeros_like(safe), safe // nx, safe % nx],
                           -1).astype(jnp.int32)
        return pillar * uvalid[..., None], coords, uvalid


class BaseBEVBackboneV1(nn.Module):
    """FPN-input BEV trunk (base_bev_backbone.py BaseBEVBackboneV1):
    consumes two multi-scale maps, refines each, upsamples, concatenates."""
    layer_nums: Tuple[int, ...] = (5, 5)
    num_filters: Tuple[int, ...] = (128, 256)
    upsample_strides: Tuple[int, ...] = (1, 2)
    num_upsample_filters: Tuple[int, ...] = (256, 256)

    @nn.compact
    def __call__(self, maps: Sequence[jnp.ndarray], train: bool = False
                 ) -> jnp.ndarray:
        ups = []
        for i, x in enumerate(maps):
            for k in range(self.layer_nums[i]):
                x = nn.Conv(self.num_filters[i], (3, 3), use_bias=False,
                            name=f"block{i}_l{k}")(x)
                x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                                 name=f"block{i}_l{k}_bn")(x)
                x = nn.relu(x)
            us = self.upsample_strides[i]
            u = nn.ConvTranspose(self.num_upsample_filters[i], (us, us),
                                 strides=(us, us), use_bias=False,
                                 name=f"deblock{i}")(x)
            u = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                             name=f"deblock{i}_bn")(u)
            ups.append(nn.relu(u))
        return jnp.concatenate(ups, -1)


class PillarRes18Backbone(nn.Module):
    """2D sparse residual pillar backbone (spconv_backbone_2d.py
    PillarRes18BackBone8x) on z=1 SparseTensors: residual stages at strides
    1/2/4/8 emitting multi-scale sparse maps."""
    channels: Tuple[int, ...] = (32, 64, 128, 256)
    max_voxels_per_stage: Tuple[int, ...] = (4096, 4096, 2048, 1024)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = False
                 ) -> Dict[str, SparseTensor]:
        ch = self.channels
        caps = self.max_voxels_per_stage
        x = SparseConvBlock(ch[0], "subm", dtype=self.dtype,
                            name="conv_input")(st, train)
        x1 = SparseBasicBlock(ch[0], self.dtype, name="res1_0")(x, train)
        x1 = SparseBasicBlock(ch[0], self.dtype, name="res1_1")(x1, train)
        out = {"x_conv1": x1}
        x = x1
        for i in range(1, 4):
            x = SparseConvBlock(ch[i], "spconv", stride=(1, 2, 2),
                                padding=(0, 1, 1), kernel_size=(1, 3, 3),
                                max_out_voxels=caps[i],
                                dtype=self.dtype,
                                name=f"conv{i + 1}_down")(x, train)
            x = SparseBasicBlock(ch[i], self.dtype,
                                 name=f"res{i + 1}_0")(x, train)
            x = SparseBasicBlock(ch[i], self.dtype,
                                 name=f"res{i + 1}_1")(x, train)
            out[f"x_conv{i + 1}"] = x
        return out


class FocalSparseConv(nn.Module):
    """Learned voxel-importance gating (focal_sparse_conv.py): a submanifold
    conv predicts per-voxel importance; features are gated by its sigmoid
    and the active set is re-selected to the top-k most important voxels.
    The training-time importance loss against GT-box membership is exposed
    as an auxiliary output."""
    out_channels: int
    top_k: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = False):
        nbr = _neighbor_idx_subm(st.coords, st.valid, st.spatial_shape, 3)
        feat = SubMConv3d(self.out_channels, dtype=self.dtype,
                          name="conv")(st, nbr)
        imp = SubMConv3d(1, dtype=self.dtype,
                         name="importance")(st, nbr).features[..., 0]
        gate = jax.nn.sigmoid(imp)
        gated = feat.features * gate[..., None]

        k = min(self.top_k, st.features.shape[1])
        score = jnp.where(st.valid, gate, -jnp.inf)
        _, idx = jax.lax.top_k(score, k)                     # (B, k)
        new = SparseTensor(
            features=jnp.take_along_axis(gated, idx[..., None], axis=1),
            coords=jnp.take_along_axis(st.coords, idx[..., None], axis=1),
            valid=jnp.take_along_axis(st.valid, idx, axis=1)
            & jnp.isfinite(jnp.take_along_axis(score, idx, axis=1)),
            spatial_shape=st.spatial_shape)
        return new, imp
