"""Legacy / prototype model families shipped by the reference.

Capability parity with the reference's inactive predecessors (SURVEY.md §2.5):
  - GARNet / GARNet_All (gat_model.py:1701-1803, 1856+): the RGB-only
    predecessor — backbone features, GIoU+feature-distance adjacency via a
    Linear(2,1) embed, 7 action heads on group-pooled features.
  - Tran_SG / SocialGrouping_model (model/sg_model.py:138-260): learnable
    group tokens + transformer encoder over actor features; adjacency =
    Gaussian similarity of a projected embedding.
  - Act_Baseline_model (model/jrdb_act_rep/act_model.py:53-240): the JRDB-Act
    baseline reproduction — cosine Dv + GIoU Dg -> MLP -> A_theta, plus the
    Laplacian utilities that ops.grouping / train.losses now own.

All batched + masked, sharing this framework's ops.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.geometry import (pairwise_cosine_similarity, pairwise_euclidean,
                            pairwise_giou_2d, safe_sqrt)
from ..ops.grouping import decode_group_ids, group_max_pool
from ..ops.masked import masked_softmax
from .layers import FFN, HeadMLP


class GARNet(nn.Module):
    """RGB-only predecessor (gat_model.py:1701-1801).

    Adjacency D_sim = sigmoid-free Linear(2,1) over [(GIoU+1)/2, ||f_i-f_j||];
    action heads on node features concatenated with group-pooled features.
    Consumes precomputed per-actor features (the reference's GAR_Backbone);
    pair with RGBBackbone for the full GARNet_All.
    """
    feature_dim: int = 1024

    @nn.compact
    def __call__(self, node_features: jnp.ndarray, boxes2d: jnp.ndarray,
                 group_ids: jnp.ndarray, valid: jnp.ndarray,
                 train: bool = False):
        b, n, d = node_features.shape
        pair = valid[:, None, :] & valid[:, :, None]
        dg = (jax.vmap(pairwise_giou_2d)(boxes2d) + 1.0) / 2.0 * pair
        dv = jax.vmap(lambda f: safe_sqrt(jnp.sum(
            (f[:, None, :] - f[None, :, :]) ** 2, -1)))(node_features) * pair
        d_cat = jnp.stack([dg, dv], axis=-1)
        d_sim = nn.Dense(1, name="D_embed")(d_cat)[..., 0]
        d_sim = nn.sigmoid(d_sim) * pair

        # GT-group max-pool + concat (reference :1758-1771)
        sg_pool = jax.vmap(group_max_pool)(node_features, group_ids, valid)
        emb = jnp.concatenate([node_features, sg_pool], axis=-1)

        pose = tuple(HeadMLP(512, 4, "softmax", name=f"pose_{i}")(emb, not train)
                     for i in range(3))
        widths = (2, 4, 7, 5)
        inter = tuple(HeadMLP(512, w, "sigmoid", name=f"intr_{i}")(emb, not train)
                      for i, w in enumerate(widths))
        return d_sim, pose, inter


class TranSG(nn.Module):
    """Group-token transformer grouping head (sg_model.py:138-210).

    num_token learnable group tokens prepended to the actor sequence, a
    TransformerEncoder (d_model, nhead, N layers), then adjacency = Gaussian
    similarity exp(-d^2 / 2 sigma^2) of phi([tokens, feature, box]).
    """
    d_model: int = 512
    nhead: int = 8
    num_layers: int = 6
    num_token: int = 2
    out_feature_dim: int = 256
    sigma: float = 10.0

    @nn.compact
    def __call__(self, features: jnp.ndarray, boxes_norm: jnp.ndarray,
                 valid: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """features: (B, N, d_model); boxes_norm: (B, N, 4) in [0,1]."""
        b, n, _ = features.shape
        tokens = self.param("group_token", nn.initializers.normal(1.0),
                            (self.num_token, self.d_model))
        seq = jnp.concatenate(
            [jnp.broadcast_to(tokens[None], (b,) + tokens.shape), features], 1)
        seq_valid = jnp.concatenate(
            [jnp.ones((b, self.num_token), bool), valid], 1)
        mask = seq_valid[:, None, :] & seq_valid[:, :, None]

        x = seq
        for i in range(self.num_layers):
            att = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, name=f"mha_{i}")(
                x, x, x, mask=mask[:, None, :, :])
            x = nn.LayerNorm(name=f"ln1_{i}")(x + att)
            x = nn.LayerNorm(name=f"ln2_{i}")(x + FFN(self.d_model,
                                                      name=f"ffn_{i}")(x))

        tok = x[:, :self.num_token].reshape(b, 1, -1)
        feat = x[:, self.num_token:]
        ctx = jnp.concatenate(
            [jnp.broadcast_to(tok, (b, n, tok.shape[-1])), feat, boxes_norm], -1)
        phi = ctx
        for w, name in ((self.d_model, "phi_0"), (self.d_model, "phi_1"),
                        (self.out_feature_dim, "phi_2")):
            phi = nn.Dense(w, name=name)(phi)
            if name != "phi_2":
                phi = nn.relu(phi)
        de = jax.vmap(lambda p: pairwise_euclidean(p, zero_diagonal=True))(phi)
        pair = valid[:, None, :] & valid[:, :, None]
        return jnp.exp(-de ** 2 / (2 * self.sigma ** 2)) * pair


class ActBaseline(nn.Module):
    """JRDB-Act baseline grouping head (act_model.py:53-240): cosine Dv +
    GIoU Dg stacked through a configurable MLP to the adjacency."""
    mlp_widths: Tuple[int, ...] = (2, 16, 1)

    @nn.compact
    def __call__(self, features: jnp.ndarray, boxes2d: jnp.ndarray,
                 valid: jnp.ndarray) -> jnp.ndarray:
        pair = valid[:, None, :] & valid[:, :, None]
        dv = jax.vmap(pairwise_cosine_similarity)(features) * pair
        dg = jax.vmap(pairwise_giou_2d)(boxes2d) * pair
        x = jnp.stack([dv, dg], axis=-1)
        for i, w in enumerate(self.mlp_widths[1:]):
            x = nn.Dense(w, name=f"fc_{i}")(x)
            if i < len(self.mlp_widths) - 2:
                x = nn.relu(x)
        return nn.sigmoid(x[..., 0]) * pair
