"""MGAR: the full multimodal social-group activity recognition model.

Capability parity with reference GAR_Fusion_ALL + GAR_Fusion_Net3
(model/gat_model.py:1130-1699, 1805-1853), TPU-native: the per-batch-item
Python loop (:1396) and per-group pooling loop (:1606-1614) become batched
masked tensor ops; the per-modality BatchNorm over variable-N actors
(:1403-1405) becomes a masked BatchNorm with explicit counts; the whole
forward is one jit-compiled program with static shapes.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config, ModelConfig
from ..ops.geometry import (pairwise_cosine_similarity, pairwise_euclidean,
                            pairwise_giou_2d)
from ..ops.grouping import decode_group_ids, group_max_pool
from ..ops.masked import masked_max
from ..types import Batch, ModelOutputs
from .fusion import DAFM, SocialEncoderLayer
from .layers import HeadMLP, MaskedBatchNorm
from .lidar_backbone import LiDARBackbone
from .rgb_backbone import RGBBackbone


class GARFusionNet(nn.Module):
    """Fusion + grouping + action/activity heads (GAR_Fusion_Net3)."""
    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb: Optional[jnp.ndarray], lidar: Optional[jnp.ndarray],
                 boxes2d: jnp.ndarray, boxes3d: jnp.ndarray,
                 valid: jnp.ndarray, train: bool = False) -> ModelOutputs:
        fcfg = self.cfg.fusion
        b, n = valid.shape
        pair_valid = valid[:, None, :] & valid[:, :, None]          # (B, N, N)

        # per-modality feature norm (reference bn_rgb/bn_lidar, :1403-1405)
        if fcfg.feat_norm:
            if rgb is not None:
                rgb = MaskedBatchNorm(momentum=0.9, name="bn_rgb")(
                    rgb, mask=valid, use_running_average=not train)
                rgb = rgb * valid[..., None].astype(rgb.dtype)
            if lidar is not None:
                lidar = MaskedBatchNorm(momentum=0.9, name="bn_lidar")(
                    lidar, mask=valid, use_running_average=not train)
                lidar = lidar * valid[..., None].astype(lidar.dtype)

        # pairwise geometry (masked)
        centers3d = boxes3d[..., :3]
        de = jax.vmap(lambda p: pairwise_euclidean(p, zero_diagonal=True))(
            centers3d) * pair_valid
        dg = jax.vmap(pairwise_giou_2d)(boxes2d) * pair_valid

        # fusion
        if fcfg.modality == "RGB":
            fused = rgb
        elif fcfg.modality == "LiDAR":
            fused = lidar
        else:
            fused = DAFM(fusion=fcfg.fusion, dim=fcfg.hidden_dim,
                         sigma=fcfg.sigma, num_layers=fcfg.num_fusion_layers,
                         dtype=self.dtype, name="dafm")(
                rgb, lidar, de, pair_valid, centers=centers3d[..., :2])
        fused = fused * valid[..., None].astype(fused.dtype)

        # similarity Dv + adjacency head. sim='cosine' is the active config;
        # the Graph* learned-similarity variants (gat_model.py:1254-1271,
        # 1294-1329) produce A_theta directly.
        direct_a_theta = None
        if fcfg.sim == "cosine":
            sim_in = fused
            if fcfg.social_layer == "mlp":
                # Social_Layer (gat_model.py:1144-1145, applied :1333-1334)
                h = nn.relu(nn.Dense(256, name="social_layer_0")(fused))
                sim_in = nn.Dense(128, name="social_layer_1")(h)
                sim_in = sim_in * valid[..., None].astype(sim_in.dtype)
            elif fcfg.social_layer == "encoder":
                # Social_Encoder (gat_model.py:1146-1147)
                sim_in = SocialEncoderLayer(
                    dim=fused.shape[-1], dtype=self.dtype,
                    name="social_encoder")(fused, pair_valid)
                sim_in = sim_in * valid[..., None].astype(sim_in.dtype)
            dv = jax.vmap(pairwise_cosine_similarity)(sim_in) * pair_valid
        elif fcfg.sim == "Graph":
            # phi/sigma bilinear: Dv = phi sigma^T + sigma phi^T (:1294-1301)
            phi = nn.Dense(32, name="sim_phi_1")(
                nn.relu(nn.Dense(32, name="sim_phi_0")(fused)))
            sig = nn.Dense(32, name="sim_sigma_1")(
                nn.relu(nn.Dense(32, name="sim_sigma_0")(fused)))
            dv = (jnp.einsum("bnd,bmd->bnm", phi, sig)
                  + jnp.einsum("bnd,bmd->bnm", sig, phi)) * pair_valid
        elif fcfg.sim in ("Graph2", "Graph3", "Graph4"):
            geo = jnp.concatenate([fused, boxes3d[..., :3]], axis=-1)
            if fcfg.sim == "Graph2":
                phi = nn.Dense(8, name="sim_phi")(geo)
                sig = nn.Dense(8, name="sim_sigma")(geo)
                g = (jnp.einsum("bnd,bmd->bnm", phi, sig)
                     + jnp.einsum("bnd,bmd->bnm", sig, phi))
            elif fcfg.sim == "Graph3":
                g = jnp.einsum("bnd,bmd->bnm", geo, geo) / geo.shape[-1]
            else:  # Graph4
                phi = nn.Dense(8, name="sim_phi")(geo)
                g = jnp.einsum("bnd,bmd->bnm", phi, phi)
            direct_a_theta = nn.sigmoid(g) * pair_valid
        else:
            raise NotImplementedError(f"sim={fcfg.sim}")

        if direct_a_theta is not None:
            a_theta = direct_a_theta
        else:
            # EUCLIDEAN branch (gat_model.py:1554-1564):
            # A_theta = sigmoid(Linear(2->1)(cat(Dv, Dg)))
            dvg = jnp.stack([dv, dg], axis=-1)                      # (B, N, N, 2)
            if fcfg.euclidean:
                a_theta = nn.sigmoid(nn.Dense(1, name="D_embed")(dvg))[..., 0]
            else:
                h = nn.relu(nn.Dense(4, name="D_embed_0")(dvg))
                a_theta = nn.sigmoid(nn.Dense(1, name="D_embed_1")(h))[..., 0]
            a_theta = a_theta * pair_valid

        # eval-mode diagonal fill (reference :1576-1577)
        if not train:
            eye = jnp.eye(n, dtype=a_theta.dtype)[None]
            diag_fill = eye * valid[:, :, None].astype(a_theta.dtype)
            a_theta = a_theta * (1.0 - eye) + diag_fill

        # group decode + pooled group features
        group_ids = jax.vmap(decode_group_ids)(a_theta, valid)       # (B, N)
        sg_features = jax.vmap(group_max_pool)(fused, group_ids, valid)
        sg_features = sg_features * valid[..., None].astype(sg_features.dtype)
        if fcfg.sg_feat_org:
            sg_features = fused

        # individual-action head input (ind_action_concat, :1621-1627)
        if fcfg.ind_action_concat:
            if fcfg.modality == "LiDAR":
                res_feature = lidar
            elif fcfg.modality == "RGB":
                res_feature = rgb
            else:
                res_feature = jnp.concatenate([rgb, lidar], axis=-1)
        else:
            res_feature = jnp.concatenate([fused, sg_features], axis=-1)

        det = not train
        vmaskf = valid[..., None].astype(jnp.float32)
        pose = tuple(
            HeadMLP(512, 4, "softmax", name=f"pose_head_{i+1}")(res_feature, det)
            * vmaskf for i in range(3))
        widths = (2, 4, 7, 5)
        interaction = tuple(
            HeadMLP(512, w, "sigmoid", name=f"intrctn_head_{i+1}")(res_feature, det)
            * vmaskf for i, w in enumerate(widths))
        # SG heads: ALL sigmoid incl. pose (reference :1163-1170)
        sg_pose = tuple(
            HeadMLP(512, 4, "sigmoid", name=f"SG_pose_head_{i+1}")(sg_features, det)
            * vmaskf for i in range(3))
        sg_interaction = tuple(
            HeadMLP(512, w, "sigmoid", name=f"SG_intrctn_head_{i+1}")(sg_features, det)
            * vmaskf for i, w in enumerate(widths))

        # cardinality head (reference card_net, :1248, :1666-1670)
        pooled = masked_max(fused, valid[..., None], axis=1)         # (B, D)
        a_sum = jnp.sum(a_theta, axis=(1, 2), keepdims=False)[:, None]
        card_in = jnp.concatenate([pooled, a_sum], axis=-1)
        h = nn.relu(nn.Dense(512, name="card_net_0")(card_in))
        card = nn.Dense(1, name="card_net_1")(h)

        return ModelOutputs(
            a_theta=a_theta, pose=pose, interaction=interaction,
            sg_pose=sg_pose, sg_interaction=sg_interaction, card=card,
            group_ids=group_ids, rgb_features=rgb, lidar_features=lidar,
            fused_features=fused)


class MGAR(nn.Module):
    """Top-level model (GAR_Fusion_ALL): RGB + LiDAR backbones + fusion net."""
    cfg: "Config"      # full framework config (model + data)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, batch: Batch, train: bool = False) -> ModelOutputs:
        mcfg = self.cfg.model
        # backbone compute dtype from config (bfloat16 on TPU for MXU peak);
        # the fusion/heads stay float32 (tiny, numerically sensitive).
        bb_dtype = jnp.bfloat16 if mcfg.dtype == "bfloat16" else self.dtype
        modality = mcfg.fusion.modality
        rgb = lidar = None
        if modality in ("RGB", "Multi"):
            images = batch.images
            if images.dtype == jnp.uint8:
                # device-side ImageNet normalize: the host pipeline ships
                # raw uint8 frames (4x fewer H2D bytes, no host float math —
                # data.images_uint8) and the conversion fuses into the stem
                mean = jnp.asarray(self.cfg.data.image_mean, jnp.float32)
                std = jnp.asarray(self.cfg.data.image_std, jnp.float32)
                images = images.astype(jnp.float32) * (1.0 / (255.0 * std)) \
                    - mean / std
            rgb = RGBBackbone(mcfg.rgb, dtype=bb_dtype, name="rgb_backbone")(
                images.astype(bb_dtype), batch.boxes2d, train,
                valid=batch.person_valid)
            rgb = rgb.astype(jnp.float32)
        if modality in ("LiDAR", "Multi"):
            lidar = LiDARBackbone(mcfg.lidar,
                                  pc_cfg=self.cfg.data.point_cloud,
                                  dtype=bb_dtype, name="lidar_backbone")(
                batch.voxels, batch.voxel_coords, batch.voxel_num_points,
                batch.voxel_valid, batch.boxes3d, batch.person_valid, train,
                rulebook=batch.rulebook)
            lidar = lidar.astype(jnp.float32)
        return GARFusionNet(mcfg, dtype=self.dtype, name="gar_fusion")(
            rgb, lidar, batch.boxes2d, batch.boxes3d, batch.person_valid, train)
