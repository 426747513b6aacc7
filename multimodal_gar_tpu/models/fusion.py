"""Cross-modal fusion: DAFM and its variants, batched + masked.

Capability parity with the fusion family in reference model/gat_model.py:
  - FusionAttention_mat (:427-511) — the paper's DAFM: two single-head
    cross-attention streams whose logits are *multiplied* by the
    distance prior E_r = softmax(-De / sigma) before the softmax. ACTIVE.
  - FusionAttention (:77) — no distance bias ("Attention_normal").
  - FusionAttention2/3 (:159, :255) — additive exp(-De^2 / 2 sigma^2) bias.
  - FusionAttention_gaussian (:341) — additive Gaussian-pdf bias.
  - FusionAttention_pe (:777-866) — bbox-center positional concat into Q/K.
  - Social_Layer / Social_Encoder (:1144-1147) — similarity-input transforms.
  - plain sum / concat merges (:1414-1417).

The reference loops over batch items with variable N (gat_model.py:1396); here
everything is batched (B, N, D) with an (B, N) validity mask, so a single jit
program covers the whole batch — padded actors are excluded from every softmax
by masking.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.masked import masked_softmax
from .layers import FFN


def distance_prior(de: jnp.ndarray, pair_valid: jnp.ndarray, sigma: float,
                   mode: str) -> jnp.ndarray:
    """Distance-derived attention prior.

    Modes: 'mult_softmax' (DAFM, gat_model.py:487), 'add_exp'
    (FusionAttention2, :218), 'add_gauss' (FusionAttention_gaussian, :399),
    'none'.
    """
    if mode == "mult_softmax":
        return masked_softmax(-de / sigma, pair_valid, axis=-1)
    if mode == "add_exp":
        return jnp.exp(-de ** 2 / (2.0 * sigma ** 2)) * pair_valid
    if mode == "add_gauss":
        return (1.0 / (sigma * math.sqrt(2 * math.pi))
                * jnp.exp(-0.5 * (de / sigma) ** 2) * pair_valid)
    if mode == "none":
        return jnp.zeros_like(de)
    raise ValueError(f"unknown distance prior mode {mode!r}")


class _AttentionStream(nn.Module):
    """One cross-attention stream: Att(Q=A.Wq, K=B.Wk, V=B.Wv) + LN/FFN/LN."""
    dim: int
    bias_mode: str       # how the distance prior enters the logits
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_src: jnp.ndarray, kv_src: jnp.ndarray,
                 prior: jnp.ndarray, pair_valid: jnp.ndarray) -> jnp.ndarray:
        init = nn.initializers.kaiming_normal()
        wq = self.param("WQ", init, (self.dim, self.dim))
        wk = self.param("WK", init, (self.dim, self.dim))
        wv = self.param("WV", init, (self.dim, self.dim))

        q = q_src @ wq
        k = kv_src @ wk
        v = kv_src @ wv
        logits = jnp.einsum("bnd,bmd->bnm", q, k)
        if self.bias_mode == "mult":
            # DAFM: logits * E_r / sqrt(d) (gat_model.py:489)
            logits = logits * prior / self.dim ** 0.5
        else:
            logits = logits / self.dim ** 0.5 + prior
        att = masked_softmax(logits, pair_valid, axis=-1)
        out = jnp.einsum("bnm,bmd->bnd", att, v)

        out = nn.LayerNorm(epsilon=1e-5, name="LN1")(out + kv_src)
        out = out + FFN(self.dim, name="FFN")(out)
        return nn.LayerNorm(epsilon=1e-5, name="LN2")(out)


class FusionAttentionLayer(nn.Module):
    """One DAFM layer: R' and L' streams, both modulated by the same E_r
    (reference gat_model.py:466-511 — note the L stream also uses E_r, :503)."""
    dim: int = 512
    sigma: float = 10.0
    prior_mode: str = "mult_softmax"
    bias_mode: str = "mult"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb: jnp.ndarray, lidar: jnp.ndarray, de: jnp.ndarray,
                 pair_valid: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        prior = distance_prior(de, pair_valid, self.sigma, self.prior_mode)
        r_prime = _AttentionStream(self.dim, self.bias_mode, self.dtype,
                                   name="stream_r")(lidar, rgb, prior, pair_valid)
        l_prime = _AttentionStream(self.dim, self.bias_mode, self.dtype,
                                   name="stream_l")(rgb, lidar, prior, pair_valid)
        return r_prime, l_prime


class PositionalFusionLayer(nn.Module):
    """FusionAttention_pe (reference gat_model.py:777-866).

    Q and K are computed from the feature concatenated with the actor's 3D
    bbox center (cx, cy) — positional concat — while V comes from the raw
    feature; there is NO distance prior (sigma is accepted but unused in the
    reference too). Residual/LN/FFN/LN as in the other streams.
    """
    dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb: jnp.ndarray, lidar: jnp.ndarray,
                 centers: jnp.ndarray, pair_valid: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        init = nn.initializers.kaiming_normal()
        pe_dim = self.dim + centers.shape[-1]
        r_pe = jnp.concatenate([centers, rgb], axis=-1)
        l_pe = jnp.concatenate([centers, lidar], axis=-1)

        def stream(q_src_pe, kv_src_pe, kv_src, prefix):
            wq = self.param(f"WQ_{prefix}", init, (pe_dim, self.dim))
            wk = self.param(f"WK_{prefix}", init, (pe_dim, self.dim))
            wv = self.param(f"WV_{prefix}", init, (self.dim, self.dim))
            logits = jnp.einsum("bnd,bmd->bnm", q_src_pe @ wq,
                                kv_src_pe @ wk) / self.dim ** 0.5
            att = masked_softmax(logits, pair_valid, axis=-1)
            out = jnp.einsum("bnm,bmd->bnd", att, kv_src @ wv)
            out = nn.LayerNorm(epsilon=1e-5, name=f"LN1_{prefix}")(out + kv_src)
            out = out + FFN(self.dim, name=f"FFN_{prefix}")(out)
            return nn.LayerNorm(epsilon=1e-5, name=f"LN2_{prefix}")(out)

        r_prime = stream(l_pe, r_pe, rgb, "r")       # Q from L_pe, K/V from R
        l_prime = stream(r_pe, l_pe, lidar, "l")     # Q from R_pe, K/V from L
        return r_prime, l_prime


class SocialEncoderLayer(nn.Module):
    """Masked transformer encoder layer (post-norm, torch defaults).

    Reference Social_Encoder (gat_model.py:1146-1147): a
    nn.TransformerEncoderLayer(d_model=512, nhead=8) applied to the fused
    features before the cosine similarity (:1333-1334).
    """
    dim: int = 512
    num_heads: int = 8
    ffn_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pair_valid: jnp.ndarray) -> jnp.ndarray:
        att = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="self_att")(
            x, x, x, mask=pair_valid[:, None, :, :])
        x = nn.LayerNorm(epsilon=1e-5, name="LN1")(x + att)
        h = nn.Dense(self.ffn_dim, name="FFN_0")(x)
        h = nn.Dense(self.dim, name="FFN_1")(nn.relu(h))
        return nn.LayerNorm(epsilon=1e-5, name="LN2")(x + h)


class CrossAttentionFusion(nn.Module):
    """8-head bidirectional cross attention, max merge.

    Reference cross_attention_fusion (gat_model.py:15-41): R' = MHA(Q=L, K=R,
    V=R) + R -> LN -> FFN -> LN; symmetric L' stream; elementwise max.
    """
    dim: int = 512
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb, lidar, pair_valid):
        mask = pair_valid[:, None, :, :]                       # (B, 1, N, N)

        def stream(q_src, kv_src, prefix):
            att = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype,
                name=f"{prefix}_mha")(q_src, kv_src, kv_src, mask=mask)
            x = nn.LayerNorm(epsilon=1e-5, name=f"{prefix}_ln1")(att + kv_src)
            x = x + FFN(self.dim, name=f"{prefix}_ffn")(x)
            return nn.LayerNorm(epsilon=1e-5, name=f"{prefix}_ln2")(x)

        r = stream(lidar, rgb, "r")
        l = stream(rgb, lidar, "l")
        return jnp.maximum(r, l)


class CatAndAttFusion(nn.Module):
    """concat -> Linear(1024, 512) -> self-MHA -> LN -> FFN -> LN.

    Reference 'catandAtt' branch (gat_model.py:1234-1239, 1423-1428).
    """
    dim: int = 512
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb, lidar, pair_valid):
        x = nn.Dense(self.dim, name="FL")(
            jnp.concatenate([rgb, lidar], axis=-1))
        att = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="att")(
            x, x, x, mask=pair_valid[:, None, :, :])
        x = nn.LayerNorm(epsilon=1e-5, name="LN")(x + att)
        x = nn.LayerNorm(epsilon=1e-5, name="LN2")(FFN(self.dim, name="FL2")(x) + x)
        return x


class MMCAStyleFusion(nn.Module):
    """Joint self-attention over the concatenated [R; L] token set (2N).

    Reference FusionAttention_MMCA_sty (gat_model.py:519-591): single shared
    W_Q/K/V over the stacked 2N x D sequence, then split and max-merge.
    """
    dim: int = 512
    num_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb, lidar, pair_valid):
        n_actors = pair_valid.shape[1]
        diag = jnp.arange(n_actors)
        valid = pair_valid[:, diag, diag]                       # (B, N)
        valid2 = jnp.concatenate([valid, valid], axis=1)        # (B, 2N)
        pv = valid2[:, None, :] & valid2[:, :, None]
        x = jnp.concatenate([rgb, lidar], axis=1)               # (B, 2N, D)
        init = nn.initializers.kaiming_normal()
        for i in range(self.num_layers):
            wq = self.param(f"WQ_{i}", init, (self.dim, self.dim))
            wk = self.param(f"WK_{i}", init, (self.dim, self.dim))
            wv = self.param(f"WV_{i}", init, (self.dim, self.dim))
            logits = jnp.einsum("bnd,bmd->bnm", x @ wq, x @ wk) / self.dim ** 0.5
            att = masked_softmax(logits, pv, axis=-1)
            y = jnp.einsum("bnm,bmd->bnd", att, x @ wv)
            y = nn.LayerNorm(epsilon=1e-5, name=f"LN1_{i}")(y + x)
            y = y + FFN(self.dim, name=f"FFN_{i}")(y)
            x = nn.LayerNorm(epsilon=1e-5, name=f"LN2_{i}")(y)
        n = rgb.shape[1]
        return jnp.maximum(x[:, :n], x[:, n:])


class DAFM(nn.Module):
    """Stacked distance-aware fusion, elementwise-max merge.

    fusion='Attention_mat' => 2 layers of FusionAttention_mat + max merge
    (reference gat_model.py:1467-1475). Other fusion names select the
    matching prior/bias and merge.
    """
    fusion: str = "Attention_mat"
    dim: int = 512
    sigma: float = 10.0
    num_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb: jnp.ndarray, lidar: jnp.ndarray, de: jnp.ndarray,
                 pair_valid: jnp.ndarray,
                 centers: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if self.fusion == "sum":
            return rgb + lidar
        if self.fusion == "concat":
            return jnp.concatenate([rgb, lidar], axis=-1)
        if self.fusion == "Attention_pe":
            # bbox-center positional concat (gat_model.py:1507-1511):
            # bb = bboxes3d[:, :2], two stacked layers, elementwise-max merge
            assert centers is not None, "Attention_pe needs bbox3d centers"
            r, l = rgb, lidar
            for i in range(self.num_layers):
                r, l = PositionalFusionLayer(
                    dim=self.dim, dtype=self.dtype,
                    name=f"pe_layer_{i}")(r, l, centers, pair_valid)
            return jnp.maximum(r, l)
        if self.fusion == "crossAtt":
            return CrossAttentionFusion(dim=self.dim, dtype=self.dtype,
                                        name="cross_att")(rgb, lidar, pair_valid)
        if self.fusion == "catandAtt":
            return CatAndAttFusion(dim=self.dim, dtype=self.dtype,
                                   name="cat_and_att")(rgb, lidar, pair_valid)
        if self.fusion == "Attention_MMCA_sty":
            return MMCAStyleFusion(dim=self.dim, num_layers=self.num_layers,
                                   dtype=self.dtype,
                                   name="mmca")(rgb, lidar, pair_valid)

        prior_mode, bias_mode, merge = {
            "Attention_mat": ("mult_softmax", "mult", "max"),
            "Attention_normal": ("none", "add", "max"),
            "Attention_gaussian": ("add_gauss", "add", "max"),
            "Attention_exp": ("add_exp", "add", "max"),
            "Attention_multi": ("add_exp", "add", "max"),
            "Attention_multi_cat": ("add_exp", "add", "concat"),
        }[self.fusion]

        r, l = rgb, lidar
        for i in range(self.num_layers):
            r, l = FusionAttentionLayer(
                dim=self.dim, sigma=self.sigma, prior_mode=prior_mode,
                bias_mode=bias_mode, dtype=self.dtype,
                name=f"layer_{i}")(r, l, de, pair_valid)
        if merge == "max":
            return jnp.maximum(r, l)
        return jnp.concatenate([r, l], axis=-1)
