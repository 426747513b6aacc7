"""Two-stage spatial + cross-entity non-local attention.

Capability parity with reference SpaTemp_self_att (gat_model.py:43-75): a 2D
non-local block within each entity's patch, pooled (avg or flatten), then a 1D
non-local block across entities.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .nonlocal_block import NLBlockND


class SpaTempSelfAtt(nn.Module):
    in_channels: int
    inter_channels: int | None = None
    mode: str = "dot"
    pool: str = "avg"          # 'avg' | 'flat' (flat = LiDAR 96*6*6 variant)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (N, H, W, C) per-entity patches -> (N, C') entity features."""
        n = x.shape[0]
        x = NLBlockND(self.in_channels, self.inter_channels, self.mode,
                      dtype=self.dtype, name="spa_block")(x, train)
        if self.pool == "avg":
            feat = jnp.mean(x, axis=(1, 2))                     # (N, C)
            ch = self.in_channels
            temp_inter = self.inter_channels
        else:  # 'flat': flatten H*W into channels (reference :49-50)
            feat = x.reshape(n, -1)                             # (N, H*W*C)
            ch = feat.shape[-1]
            temp_inter = ch // 2
        # 1D non-local across entities: sequence of N tokens
        seq = feat[None, :, :]                                  # (1, N, C')
        seq = NLBlockND(ch, temp_inter, self.mode,
                        dtype=self.dtype, name="temp_block")(seq, train)
        return seq[0]
