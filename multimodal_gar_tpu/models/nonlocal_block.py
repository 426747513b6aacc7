"""Non-local self-attention block (Wang et al. 2018), channels-last.

Capability parity with reference model/backbone.py:558-686 (NLBlockND:
1/2/3-dimensional, modes gaussian/embedded/dot/concatenate, BN-zero-init
residual). The active config uses mode='dot' with dimension=2 for the RGB
branch (832 ch, inter 104) and dimension=3 for the LiDAR branch (96 ch,
inter 12).

TPU-first layout: inputs are channels-LAST — (N, *spatial, C) — so the 1x1
projections are Dense layers (plain matmuls on the MXU) instead of convs, and
the (P, P) position-attention runs as two batched GEMMs.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class NLBlockND(nn.Module):
    """x: (N, *spatial, C) -> same shape, residual non-local attention.

    The spatial rank is inferred from the input (1, 2 or 3 trailing spatial
    dims), so one module covers the reference's dimension={1,2,3} variants.
    """
    in_channels: int
    inter_channels: int | None = None
    mode: str = "dot"               # gaussian | embedded | dot | concatenate
    bn_layer: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 valid: jnp.ndarray | None = None) -> jnp.ndarray:
        inter = self.inter_channels or max(self.in_channels // 2, 1)
        n = x.shape[0]
        spatial = x.shape[1:-1]
        p = 1
        for s in spatial:
            p *= s
        flat = x.reshape(n, p, self.in_channels)                     # (N, P, C)

        g_x = nn.Dense(inter, dtype=self.dtype, name="g")(flat)      # (N, P, Ci)

        if self.mode == "gaussian":
            f = jnp.einsum("npc,nqc->npq", flat, flat)
        elif self.mode in ("embedded", "dot"):
            theta = nn.Dense(inter, dtype=self.dtype, name="theta")(flat)
            phi = nn.Dense(inter, dtype=self.dtype, name="phi")(flat)
            f = jnp.einsum("npc,nqc->npq", theta, phi)               # (N, P, P)
        elif self.mode == "concatenate":
            theta = nn.Dense(inter, dtype=self.dtype, name="theta")(flat)
            phi = nn.Dense(inter, dtype=self.dtype, name="phi")(flat)
            cat = jnp.concatenate([
                jnp.broadcast_to(theta[:, :, None, :], (n, p, p, inter)),
                jnp.broadcast_to(phi[:, None, :, :], (n, p, p, inter)),
            ], axis=-1)
            f = nn.relu(nn.Dense(1, name="W_f")(cat))[..., 0]        # (N, P, P)
        else:
            raise ValueError(f"unknown mode {self.mode}")

        if self.mode in ("gaussian", "embedded"):
            f_div = nn.softmax(f, axis=-1)
        else:  # dot / concatenate: normalize by position count
            f_div = f / p

        y = jnp.einsum("npq,nqc->npc", f_div, g_x)                   # (N, P, Ci)

        # W_z projection back to C with zero-init BN (or zero-init conv) so the
        # block starts as identity (reference backbone.py:606-620).
        if self.bn_layer:
            w_y = nn.Dense(self.in_channels, dtype=self.dtype, name="W_z")(y)
            # `valid` (N,) marks real entity rows: the reference applies the
            # block to valid-person slices only, so padded rows must not
            # contaminate the batch statistics (CLAUDE.md masked-BN rule)
            bn_mask = None
            if valid is not None and train:
                bn_mask = jnp.broadcast_to(
                    valid[:, None, None], w_y.shape)
            w_y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                scale_init=nn.initializers.zeros, dtype=self.dtype,
                name="W_z_bn")(w_y, mask=bn_mask)
        else:
            w_y = nn.Dense(self.in_channels, kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros, dtype=self.dtype,
                           name="W_z")(y)

        return (w_y + flat).reshape(x.shape)
