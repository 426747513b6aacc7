"""Detector zoo: full 3D detectors assembled from the shared modules.

Capability parity with pcdet/models/detectors/ (registry at
detectors/__init__.py:17-34) and the module-topology builder of
Detector3DTemplate (detector3d_template.py:23-50): each detector is a typed
composition of VFE -> 3D backbone -> map-to-BEV -> 2D backbone -> dense head
(-> RoI head), with losses and fixed-shape post-processing.

This module provides the dense single-stage families:
  - SECOND (second_net.py:4-34)
  - PointPillar (pointpillar.py:4-34)
  - CenterPoint (centerpoint.py:4-50)
  - PillarNet = PointPillar topology with a deeper pillar trunk
    (pillarnet.py:5-49), expressed via DetectorConfig.
Two-stage detectors (PV-RCNN, VoxelRCNN-det, SECOND-IoU, PartA2, PointRCNN)
live in roi_detectors.py.

TPU-native design: the whole forward-plus-loss path is one jit (fixed-shape
padded voxels/GTs, masked everywhere); anchors and target assignment are
static/vmapped (target_assign.py); post-processing returns padded outputs.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from ..models.sparse_backbone import (SparseConv3dDown, SparseTensor,
                                      VoxelBackbone8x)
from .anchors import (AnchorClassConfig, KITTI_ANCHORS, KITTI_CLASS_NAMES,
                      KITTI_PILLAR_RANGE, KITTI_PILLAR_SIZE,
                      KITTI_POINT_CLOUD_RANGE, KITTI_VOXEL_SIZE)
from .bev import BaseBEVBackbone, pillar_scatter, sparse_to_dense_bev
from .box_coders import ResidualCoder
from .dense_heads import (AnchorHeadConfig, AnchorHeadSingle, CenterHead,
                          CenterHeadConfig, anchor_head_loss,
                          center_head_loss, decode_anchor_preds,
                          decode_center_preds)
from .post import NMSConfig, class_agnostic_nms, post_processing
from .target_assign import AnchorSet, build_anchor_set
from .vfe import PillarVFE, mean_vfe


@flax.struct.dataclass
class DetBatch:
    """Padded detection batch (the collate_batch analogue for the zoo)."""
    voxels: jnp.ndarray            # (B, M, P, C)
    voxel_coords: jnp.ndarray      # (B, M, 3) int32 zyx
    voxel_num_points: jnp.ndarray  # (B, M)
    voxel_valid: jnp.ndarray       # (B, M) bool
    gt_boxes: jnp.ndarray          # (B, G, 7)
    gt_classes: jnp.ndarray        # (B, G) int32 1-based
    gt_valid: jnp.ndarray          # (B, G) bool
    rulebook: Optional[Dict[str, jnp.ndarray]] = None
    points: Optional[jnp.ndarray] = None        # (B, N, 4+) raw points
    point_valid: Optional[jnp.ndarray] = None   # (B, N) bool
    # camera-based detectors (CaDDN)
    images: Optional[jnp.ndarray] = None        # (B, H, W, 3)
    lidar_to_cam: Optional[jnp.ndarray] = None  # (B, 4, 4)
    cam_to_img: Optional[jnp.ndarray] = None    # (B, 3, 4)
    depth_maps: Optional[jnp.ndarray] = None    # (B, H, W) GT depth


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    name: str = "SECOND"
    class_names: Tuple[str, ...] = KITTI_CLASS_NAMES
    point_cloud_range: Tuple[float, ...] = KITTI_POINT_CLOUD_RANGE
    voxel_size: Tuple[float, float, float] = KITTI_VOXEL_SIZE
    max_voxels_per_stage: Tuple[int, int, int, int] = (16000, 16000, 8000, 4000)
    anchors: Tuple[AnchorClassConfig, ...] = KITTI_ANCHORS
    head: AnchorHeadConfig = AnchorHeadConfig()
    center_head: CenterHeadConfig = CenterHeadConfig()
    nms: NMSConfig = NMSConfig()
    # 2D BEV trunk
    bev_layer_nums: Tuple[int, ...] = (5, 5)
    bev_layer_strides: Tuple[int, ...] = (1, 2)
    bev_num_filters: Tuple[int, ...] = (128, 256)
    bev_upsample_strides: Tuple[int, ...] = (1, 2)
    bev_num_upsample_filters: Tuple[int, ...] = (256, 256)
    # pillar families
    pillar_filters: Tuple[int, ...] = (64,)
    # x-window sparse-conv gathers for the VoxelBackbone8x trunk (see
    # models/sparse_backbone.window_gather); safe wherever downstream
    # consumers are voxel-order-agnostic (the BEV scatter is). UNetV2
    # keeps the nbr path (its decoder pairs rows with the input set).
    x_window: bool = False
    dtype: str = "float32"

    @property
    def grid_size(self) -> Tuple[int, int, int]:
        pr, vs = self.point_cloud_range, self.voxel_size
        return (int(round((pr[3] - pr[0]) / vs[0])),
                int(round((pr[4] - pr[1]) / vs[1])),
                int(round((pr[5] - pr[2]) / vs[2])))

    @property
    def sparse_shape(self) -> Tuple[int, int, int]:
        nx, ny, nz = self.grid_size
        return (nz + 1, ny, nx)          # z padded by 1, reference convention

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


@functools.lru_cache(maxsize=32)
def anchor_set_for(cfg: DetectorConfig) -> AnchorSet:
    return build_anchor_set(cfg.anchors, cfg.grid_size[:2],
                            cfg.point_cloud_range)


def _coder(cfg: DetectorConfig) -> ResidualCoder:
    return ResidualCoder(
        encode_angle_by_sincos=cfg.head.encode_angle_by_sincos)


class SparseOutConv(nn.Module):
    """conv_out: (3,1,1)-stride-(2,1,1) sparse conv + BN + ReLU producing the
    encoded tensor for BEV heads (spconv_backbone.py:109-117)."""
    out_channels: int = 128
    max_out_voxels: int = 4000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = False) -> SparseTensor:
        st = SparseConv3dDown(self.out_channels, kernel_size=(3, 1, 1),
                              stride=(2, 1, 1), padding=0,
                              max_out_voxels=self.max_out_voxels,
                              dtype=self.dtype, name="conv")(st)
        f = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         name="bn")(
            st.features,
            mask=jnp.broadcast_to(st.valid[..., None], st.features.shape)
            if train else None)
        f = nn.relu(f) * st.valid[..., None].astype(f.dtype)
        return st.replace(features=f)


class VoxelDenseTrunk(nn.Module):
    """Shared voxel trunk: MeanVFE -> VoxelBackbone8x -> conv_out -> BEV ->
    BaseBEVBackbone. Used by SECOND / CenterPoint (and VoxelRCNN-det)."""
    cfg: DetectorConfig

    @nn.compact
    def __call__(self, batch: DetBatch, train: bool = False):
        c = self.cfg
        feats = mean_vfe(batch.voxels, batch.voxel_num_points)
        feats = feats * batch.voxel_valid[..., None].astype(feats.dtype)
        st = SparseTensor(features=feats, coords=batch.voxel_coords,
                          valid=batch.voxel_valid,
                          spatial_shape=c.sparse_shape)
        ms = VoxelBackbone8x(max_voxels_per_stage=c.max_voxels_per_stage,
                             dtype=c.compute_dtype, x_window=c.x_window,
                             name="backbone_3d")(st, train, batch.rulebook)
        out = SparseOutConv(128, max_out_voxels=c.max_voxels_per_stage[3],
                            dtype=c.compute_dtype, name="conv_out")(
            ms["x_conv4"], train)
        bev = sparse_to_dense_bev(out)                      # (B,H/8,W/8,2*128)
        bev2d = BaseBEVBackbone(
            c.bev_layer_nums, c.bev_layer_strides, c.bev_num_filters,
            c.bev_upsample_strides, c.bev_num_upsample_filters,
            name="backbone_2d")(bev.astype(c.compute_dtype), train)
        return bev2d.astype(jnp.float32), ms


class PillarTrunk(nn.Module):
    """PillarVFE -> scatter -> BaseBEVBackbone (PointPillar/PillarNet)."""
    cfg: DetectorConfig

    @nn.compact
    def __call__(self, batch: DetBatch, train: bool = False):
        c = self.cfg
        pf = PillarVFE(num_filters=c.pillar_filters,
                       voxel_size=c.voxel_size,
                       point_cloud_range=c.point_cloud_range,
                       name="vfe")(batch.voxels, batch.voxel_coords,
                                   batch.voxel_num_points, batch.voxel_valid,
                                   train)
        canvas = pillar_scatter(pf, batch.voxel_coords, batch.voxel_valid,
                                c.grid_size[:2])
        bev2d = BaseBEVBackbone(
            c.bev_layer_nums, c.bev_layer_strides, c.bev_num_filters,
            c.bev_upsample_strides, c.bev_num_upsample_filters,
            name="backbone_2d")(canvas.astype(c.compute_dtype), train)
        return bev2d.astype(jnp.float32), None


class AnchorDetector(nn.Module):
    """Single-stage anchor detector = trunk + AnchorHeadSingle.

    SECOND (second_net.py) when trunk='voxel'; PointPillar (pointpillar.py) /
    PillarNet (pillarnet.py) when trunk='pillar'.
    """
    cfg: DetectorConfig
    trunk: str = "voxel"             # voxel | pillar

    @nn.compact
    def __call__(self, batch: DetBatch, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        trunk = VoxelDenseTrunk(self.cfg, name="trunk") \
            if self.trunk == "voxel" else PillarTrunk(self.cfg, name="trunk")
        bev2d, _ = trunk(batch, train)
        aset = anchor_set_for(self.cfg)
        return AnchorHeadSingle(self.cfg.head, aset.num_per_loc,
                                _coder(self.cfg).full_code_size,
                                name="dense_head")(bev2d)

    def loss(self, preds: Dict[str, jnp.ndarray], batch: DetBatch
             ) -> Dict[str, jnp.ndarray]:
        losses = anchor_head_loss(preds, anchor_set_for(self.cfg),
                                  _coder(self.cfg), self.cfg.head,
                                  batch.gt_boxes, batch.gt_classes,
                                  batch.gt_valid)
        losses["loss"] = losses["rpn_loss"]
        return losses

    def predict(self, preds: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cls, boxes = decode_anchor_preds(preds, anchor_set_for(self.cfg),
                                         _coder(self.cfg), self.cfg.head)
        return post_processing(cls, boxes, self.cfg.nms)


class CenterPointDetector(nn.Module):
    """CenterPoint (centerpoint.py): voxel trunk + CenterHead."""
    cfg: DetectorConfig

    @nn.compact
    def __call__(self, batch: DetBatch, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        bev2d, _ = VoxelDenseTrunk(self.cfg, name="trunk")(batch, train)
        return CenterHead(self.cfg.center_head, name="dense_head")(bev2d,
                                                                   train)

    def loss(self, preds, batch: DetBatch) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        losses = center_head_loss(preds, c.center_head, c.grid_size,
                                  c.voxel_size, c.point_cloud_range,
                                  batch.gt_boxes, batch.gt_classes,
                                  batch.gt_valid)
        losses["loss"] = losses["center_loss"]
        return losses

    def predict(self, preds) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        scores, labels, boxes = decode_center_preds(
            preds, c.center_head, c.grid_size, c.voxel_size,
            c.point_cloud_range, max_boxes=min(c.nms.nms_pre_maxsize, 500))
        # center_head.py:285 runs class_agnostic_nms on the decoded boxes;
        # without it adjacent heatmap cells of one object emit duplicates.
        def per_item(sc, bx, lb):
            idx, s, v = class_agnostic_nms(sc, bx, c.nms)
            return bx[idx], s, lb[idx], v

        bx, sc, lb, vd = jax.vmap(per_item)(scores, boxes, labels)
        return {"boxes": bx, "scores": sc,
                "labels": lb * vd.astype(jnp.int32), "valid": vd}


# ---------------------------------------------------------------------------
# Registry (build_detector analogue, detectors/__init__.py:37-42)
# ---------------------------------------------------------------------------

def _pillar_cfg(name: str, **kw) -> DetectorConfig:
    pillar_anchors = tuple(
        dataclasses.replace(a, feature_map_stride=2) for a in KITTI_ANCHORS)
    return DetectorConfig(
        name=name, point_cloud_range=KITTI_PILLAR_RANGE,
        voxel_size=KITTI_PILLAR_SIZE, anchors=pillar_anchors,
        bev_layer_nums=(3, 5, 5), bev_layer_strides=(2, 2, 2),
        bev_num_filters=(64, 128, 256), bev_upsample_strides=(1, 2, 4),
        bev_num_upsample_filters=(128, 128, 128), **kw)


def default_config(name: str) -> DetectorConfig:
    if name in ("SECOND", "SECONDNet"):
        return DetectorConfig(name="SECOND")
    if name == "CenterPoint":
        return DetectorConfig(name="CenterPoint")
    if name == "PointPillar":
        return _pillar_cfg("PointPillar")
    if name == "PillarNet":
        # pillarnet.py: deeper pillar trunk, same head family
        return dataclasses.replace(
            _pillar_cfg("PillarNet"), pillar_filters=(64, 128))
    raise KeyError(name)


_DETECTORS = {}


def register_detector(name: str):
    def deco(fn):
        _DETECTORS[name] = fn
        return fn
    return deco


def available_detectors():
    return sorted(_DETECTORS)


def build_detector(name: str, cfg: Optional[DetectorConfig] = None):
    """pcdet build_detector analogue: name -> constructed Flax detector."""
    if name not in _DETECTORS:
        raise KeyError(f"unknown detector {name!r}; have {available_detectors()}")
    return _DETECTORS[name](cfg or default_config(name))


@register_detector("SECONDNet")
@register_detector("SECOND")
def _build_second(cfg):
    return AnchorDetector(cfg, trunk="voxel")


@register_detector("PointPillar")
@register_detector("PillarNet")
def _build_pillar(cfg):
    return AnchorDetector(cfg, trunk="pillar")


@register_detector("CenterPoint")
def _build_centerpoint(cfg):
    return CenterPointDetector(cfg)
