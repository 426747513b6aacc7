"""CaDDN: monocular camera detector via categorical depth distributions.

Capability parity with pcdet/models/detectors/caddn.py and the ImageVFE
stack (backbones_3d/vfe/image_vfe.py, image_vfe_modules/ffn/* and f2v/*):
a depth-distribution network (DDN) predicts per-pixel depth-bin logits and
image features; frustum features are the outer product of the depth
distribution and the channel-reduced features; a frustum-to-voxel transform
samples them at projected voxel centers; the dense voxel grid is collapsed
to BEV (Conv2DCollapse) and fed to the standard BEV backbone + anchor head.
Depth supervision is a focal cross-entropy over depth bins with a
foreground/background balancer (ddn_loss/{ddn_loss,balancer}.py).

TPU-native design: the frustum->voxel resample is one vmapped trilinear
gather over (u, v, depth-bin) computed from the calibration matrices
(frustum_grid_generator.py:79-145 without kornia); out-of-frustum voxels
zero out via the gather mask. The DDN defaults to the reference's
DeepLabV3 + ResNet101 (ddn_deeplab.py, layer1 feature tap + ASPP
classifier); ``ddn_arch="compact"`` selects a small conv encoder with the
same contract (stride-S features + D+1 depth logits) for tests and fast
iteration.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .bev import BaseBEVBackbone, Conv2DCollapse
from .dense_heads import (AnchorHeadSingle, anchor_head_loss,
                          decode_anchor_preds)
from .detectors import (DetBatch, DetectorConfig, anchor_set_for,
                        register_detector, _coder)
from .post import post_processing


@dataclasses.dataclass(frozen=True)
class CaDDNConfig:
    # "deeplabv3_r101" / "deeplabv3_r50": the reference's DDNDeepLabV3
    # (ddn_deeplab.py); "compact": a small conv encoder with the same
    # contract, for tests and fast iteration.
    ddn_arch: str = "deeplabv3_r101"
    num_depth_bins: int = 80
    depth_min: float = 2.0
    depth_max: float = 46.8
    disc_mode: str = "LID"               # UD | LID | SID
    downsample_factor: int = 4
    ddn_channels: Tuple[int, ...] = (32, 64, 128)
    channel_reduce: int = 64             # frustum feature channels
    bev_collapse_channels: int = 64
    ddn_loss_weight: float = 3.0
    ddn_alpha: float = 0.25
    ddn_gamma: float = 2.0
    fg_weight: float = 13.0
    bg_weight: float = 1.0


def bin_depths(depth: jnp.ndarray, mode: str, depth_min: float,
               depth_max: float, num_bins: int,
               target: bool = False) -> jnp.ndarray:
    """Continuous depth -> bin index (transform_utils.bin_depths).

    UD: uniform; LID: linearly-increasing bin widths; SID: log-spaced.
    With target=True, out-of-range depths clamp into [0, num_bins] with the
    extra bin num_bins acting as the reference's 'sky' class.
    """
    if mode == "UD":
        size = (depth_max - depth_min) / num_bins
        idx = (depth - depth_min) / size
    elif mode == "LID":
        size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        idx = -0.5 + 0.5 * jnp.sqrt(
            jnp.maximum(1 + 8 * (depth - depth_min) / size, 0.0))
    elif mode == "SID":
        idx = num_bins * (jnp.log(1 + jnp.maximum(depth, 1e-6))
                          - np.log(1 + depth_min)) \
            / (np.log(1 + depth_max) - np.log(1 + depth_min))
    else:
        raise NotImplementedError(mode)
    if target:
        idx = jnp.where(jnp.isfinite(idx), idx, float(num_bins))
        return jnp.clip(jnp.floor(idx), 0, num_bins).astype(jnp.int32)
    return idx


class DDN(nn.Module):
    """Compact depth-distribution network (ddn_template.py contract):
    stride-S image features + (num_bins + 1) depth logits."""
    cfg: CaDDNConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        x = images
        stride = 1
        for i, ch in enumerate(self.cfg.ddn_channels):
            s = 2 if stride < self.cfg.downsample_factor else 1
            stride *= s
            x = nn.Conv(ch, (3, 3), strides=(s, s), use_bias=False,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
        feats = nn.Conv(self.cfg.channel_reduce, (1, 1),
                        name="channel_reduce")(x)
        logits = nn.Conv(self.cfg.num_depth_bins + 1, (1, 1),
                         name="depth_out")(x)
        return feats, logits


def frustum_to_voxel(frustum: jnp.ndarray, lidar_to_cam: jnp.ndarray,
                     cam_to_img: jnp.ndarray, image_shape: Tuple[int, int],
                     grid_size: Tuple[int, int, int],
                     pc_range, cfg: CaDDNConfig) -> jnp.ndarray:
    """Sample frustum features (Hf, Wf, D, C) at projected voxel centers
    -> dense (nz, ny, nx, C). One item (vmap over batch).

    frustum_grid_generator semantics: voxel center -> lidar -> camera ->
    image (u, v) + depth -> continuous depth-bin index; trilinear gather.
    """
    nx, ny, nz = grid_size
    hf, wf, d, c = frustum.shape
    ih, iw = image_shape
    vs = (jnp.asarray(pc_range[3:6]) - jnp.asarray(pc_range[:3])) \
        / jnp.asarray([nx, ny, nz], jnp.float32)

    zz, yy, xx = jnp.meshgrid(jnp.arange(nz), jnp.arange(ny),
                              jnp.arange(nx), indexing="ij")
    centers = jnp.stack([xx, yy, zz], -1).astype(jnp.float32) + 0.5
    centers = centers * vs + jnp.asarray(pc_range[:3])         # (nz,ny,nx,3)
    pts = centers.reshape(-1, 3)
    hom = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], -1)
    cam = (lidar_to_cam @ hom.T).T[:, :3]
    img = (cam_to_img @ jnp.concatenate(
        [cam, jnp.ones_like(cam[:, :1])], -1).T).T               # (N, 3)
    depth = img[:, 2]
    u = img[:, 0] / jnp.where(jnp.abs(depth) > 1e-6, depth, 1e-6)
    v = img[:, 1] / jnp.where(jnp.abs(depth) > 1e-6, depth, 1e-6)
    db = bin_depths(depth, cfg.disc_mode, cfg.depth_min, cfg.depth_max,
                    cfg.num_depth_bins)
    # to feature-map coordinates
    uf = u / (iw / wf)
    vf = v / (ih / hf)
    inb = (depth > 0) & (uf >= 0) & (uf < wf) & (vf >= 0) & (vf < hf) \
        & (db >= 0) & (db < d)

    def tri(vf_, uf_, db_):
        out = 0.0
        v0 = jnp.floor(vf_).astype(jnp.int32)
        u0 = jnp.floor(uf_).astype(jnp.int32)
        d0 = jnp.floor(db_).astype(jnp.int32)
        acc = jnp.zeros((vf_.shape[0], c), frustum.dtype)
        for dv in (0, 1):
            for du in (0, 1):
                for dd in (0, 1):
                    vi = jnp.clip(v0 + dv, 0, hf - 1)
                    ui = jnp.clip(u0 + du, 0, wf - 1)
                    di = jnp.clip(d0 + dd, 0, d - 1)
                    w = (1 - jnp.abs(vf_ - (v0 + dv))) \
                        * (1 - jnp.abs(uf_ - (u0 + du))) \
                        * (1 - jnp.abs(db_ - (d0 + dd)))
                    w = jnp.clip(w, 0.0, 1.0)
                    acc = acc + frustum[vi, ui, di] * w[:, None]
        return acc

    sampled = tri(vf, uf, db) * inb[:, None].astype(frustum.dtype)
    return sampled.reshape(nz, ny, nx, c)


class CaDDNDetector(nn.Module):
    """caddn.py topology: ImageVFE (DDN -> frustum -> voxel) ->
    Conv2DCollapse -> BaseBEVBackbone -> AnchorHeadSingle."""
    cfg: DetectorConfig
    cd_cfg: CaDDNConfig = CaDDNConfig()

    @nn.compact
    def __call__(self, batch: DetBatch, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        c, cd = self.cfg, self.cd_cfg
        assert batch.images is not None and batch.lidar_to_cam is not None
        if cd.ddn_arch.startswith("deeplabv3"):
            from .ddn_deeplab import DeepLabV3DDN
            backbone = "ResNet50" if cd.ddn_arch.endswith("r50") \
                else "ResNet101"
            raw_feats, depth_logits = DeepLabV3DDN(
                cd.num_depth_bins + 1, backbone_name=backbone,
                name="ffn")(batch.images, train)
            # DepthFFN's CHANNEL_REDUCE (depth_ffn.py): BasicBlock2D =
            # conv (no bias) + BN + ReLU, 256 -> C
            feats = nn.Conv(cd.channel_reduce, (1, 1), use_bias=False,
                            name="channel_reduce")(raw_feats)
            feats = nn.BatchNorm(use_running_average=not train,
                                 epsilon=1e-5, momentum=0.9,
                                 name="channel_reduce_bn")(feats)
            feats = nn.relu(feats)
        else:
            feats, depth_logits = DDN(cd, name="ffn")(batch.images, train)
        # frustum features: outer product of depth distribution x features
        # (ddn_template: frustum_features = depth_probs * image_features)
        probs = jax.nn.softmax(depth_logits, -1)[..., :cd.num_depth_bins]
        frustum = probs[..., :, None] * feats[..., None, :]  # (B,Hf,Wf,D,C)

        ih, iw = batch.images.shape[1:3]
        vox = jax.vmap(functools.partial(
            frustum_to_voxel, image_shape=(ih, iw), grid_size=c.grid_size,
            pc_range=c.point_cloud_range, cfg=cd))(
            frustum, batch.lidar_to_cam, batch.cam_to_img)   # (B,nz,ny,nx,C)
        b, nz, ny, nx, ch = vox.shape
        bev_in = jnp.transpose(vox, (0, 2, 3, 1, 4)).reshape(
            b, ny, nx, nz * ch)
        bev = Conv2DCollapse(cd.bev_collapse_channels,
                             name="map_to_bev")(bev_in, train)
        bev2d = BaseBEVBackbone(
            c.bev_layer_nums, c.bev_layer_strides, c.bev_num_filters,
            c.bev_upsample_strides, c.bev_num_upsample_filters,
            name="backbone_2d")(bev, train)
        aset = anchor_set_for(c)
        preds = AnchorHeadSingle(c.head, aset.num_per_loc,
                                 _coder(c).full_code_size,
                                 name="dense_head")(bev2d)
        preds["depth_logits"] = depth_logits
        return preds

    def ddn_loss(self, depth_logits: jnp.ndarray,
                 depth_maps: jnp.ndarray,
                 fg_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Focal CE over depth bins (ddn_loss.py:24-75) with the fg/bg
        balancer (balancer.py) when a foreground mask is supplied."""
        cd = self.cd_cfg
        hf, wf = depth_logits.shape[1:3]
        ih, iw = depth_maps.shape[1:3]
        # downsample GT depth to the feature map (nearest)
        ys = (jnp.arange(hf) * (ih / hf)).astype(jnp.int32)
        xs = (jnp.arange(wf) * (iw / wf)).astype(jnp.int32)
        d = depth_maps[:, ys][:, :, xs]
        target = bin_depths(d, cd.disc_mode, cd.depth_min, cd.depth_max,
                            cd.num_depth_bins, target=True)
        logp = jax.nn.log_softmax(depth_logits, -1)
        p = jnp.exp(logp)
        onehot = jax.nn.one_hot(target, cd.num_depth_bins + 1)
        pt = (onehot * p).sum(-1)
        ce = -(onehot * logp).sum(-1)
        focal = cd.ddn_alpha * (1 - pt) ** cd.ddn_gamma * ce
        if fg_mask is not None:
            w = jnp.where(fg_mask, cd.fg_weight, cd.bg_weight)
            w = w / jnp.maximum(w.sum(), 1.0)
            return (focal * w).sum() * cd.ddn_loss_weight
        return focal.mean() * cd.ddn_loss_weight

    def loss(self, preds, batch: DetBatch) -> Dict[str, jnp.ndarray]:
        losses = anchor_head_loss(preds, anchor_set_for(self.cfg),
                                  _coder(self.cfg), self.cfg.head,
                                  batch.gt_boxes, batch.gt_classes,
                                  batch.gt_valid)
        if batch.depth_maps is not None:
            losses["ddn_loss"] = self.ddn_loss(preds["depth_logits"],
                                               batch.depth_maps)
            losses["loss"] = losses["rpn_loss"] + losses["ddn_loss"]
        else:
            losses["loss"] = losses["rpn_loss"]
        return losses

    def predict(self, preds) -> Dict[str, jnp.ndarray]:
        cls, boxes = decode_anchor_preds(preds, anchor_set_for(self.cfg),
                                         _coder(self.cfg), self.cfg.head)
        return post_processing(cls, boxes, self.cfg.nms)


@register_detector("CaDDN")
def _build_caddn(cfg):
    return CaDDNDetector(cfg)
