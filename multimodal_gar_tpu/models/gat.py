"""GATv2 over the fully-connected actor graph, batched + masked.

Capability parity with the reference's pyg_nn.GATv2Conv(512, 512, 8 heads,
dropout=0.5, concat=False) applied over a fully-connected graph of valid
people (gat_model.py:1019, 1082-1094). The reference materializes explicit
edge_index lists; on TPU the fully-connected graph is just a dense (N, N)
attention with a validity mask — no edge lists, one fused program.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.masked import masked_softmax


class GATv2Layer(nn.Module):
    """GATv2 (Brody et al. 2022): e_ij = a^T LeakyReLU(W_l h_i + W_r h_j).

    Multi-head with mean aggregation (pyg concat=False), attention dropout.
    Self-loops excluded to mirror torch_combinations-based edges (the
    reference builds pairs with r=2, i.e. no self-edges).
    """
    features: int = 512
    num_heads: int = 8
    dropout_rate: float = 0.5
    negative_slope: float = 0.2
    add_self_loops: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """x: (B, N, C) -> (B, N, features); valid: (B, N)."""
        b, n, _ = x.shape
        h = self.num_heads
        d = self.features

        wl = nn.Dense(h * d, use_bias=True, name="W_l")(x).reshape(b, n, h, d)
        wr = nn.Dense(h * d, use_bias=False, name="W_r")(x).reshape(b, n, h, d)
        a = self.param("att", nn.initializers.glorot_uniform(), (h, d))

        # e[b, h, i, j] = a_h . leaky_relu(wl[i] + wr[j])
        z = wl[:, :, None, :, :] + wr[:, None, :, :, :]       # (B, N, N, H, D)
        z = nn.leaky_relu(z, self.negative_slope)
        e = jnp.einsum("bijhd,hd->bhij", z, a)

        mask = valid[:, None, :] & valid[:, :, None]          # (B, N, N)
        if not self.add_self_loops:
            mask = mask & ~jnp.eye(n, dtype=bool)[None]
        att = masked_softmax(e, mask[:, None, :, :], axis=-1)  # (B, H, N, N)
        att = nn.Dropout(self.dropout_rate,
                         deterministic=deterministic)(att)

        out = jnp.einsum("bhij,bjhd->bihd", att, wr)          # (B, N, H, D)
        out = jnp.mean(out, axis=2)                           # concat=False
        return out * valid[..., None].astype(out.dtype)
