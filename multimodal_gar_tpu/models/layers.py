"""Shared Flax building blocks: masked batch norm, MLP heads, small utilities."""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over a set of (possibly padded) rows.

    The reference applies nn.BatchNorm1d to tensors already sliced to the valid
    actors/voxels (e.g. bn_rgb/bn_lidar at gat_model.py:1251-1252, the shared-FC
    BN at voxelrcnn_head.py:44). With fixed-shape padded tensors the padded rows
    must not contaminate the batch statistics, so statistics are computed under
    an explicit mask (flax BatchNorm's ``mask`` argument).
    """
    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 use_running_average: Optional[bool] = None) -> jnp.ndarray:
        ura = nn.merge_param("use_running_average", self.use_running_average,
                             use_running_average)
        bn_mask = None
        if mask is not None and not ura:
            bn_mask = jnp.broadcast_to(
                mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim)), x.shape)
        return nn.BatchNorm(
            use_running_average=ura, momentum=self.momentum, epsilon=self.epsilon,
            axis=-1, use_bias=True, use_scale=True,
        )(x, mask=bn_mask)


class HeadMLP(nn.Module):
    """Linear(in, 512) -> ReLU -> Dropout(0.2) -> Linear(512, out) -> activation.

    Matches the 7 action / SG-activity heads (gat_model.py:1152-1170).
    """
    hidden: int
    out: int
    activation: str = "sigmoid"        # "sigmoid" | "softmax"
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.hidden, kernel_init=nn.initializers.kaiming_normal(),
                     bias_init=nn.initializers.zeros)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = nn.Dense(self.out, kernel_init=nn.initializers.kaiming_normal(),
                     bias_init=nn.initializers.zeros)(x)
        if self.activation == "softmax":
            return nn.softmax(x, axis=-1)
        return nn.sigmoid(x)


class FFN(nn.Module):
    """Linear -> ReLU -> Linear, the fusion-block feed-forward (gat_model.py:440)."""
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.dim)(x)
        x = nn.relu(x)
        return nn.Dense(self.dim)(x)


def kaiming_dense(features: int, use_bias: bool = True) -> nn.Dense:
    return nn.Dense(features, use_bias=use_bias,
                    kernel_init=nn.initializers.kaiming_normal(),
                    bias_init=nn.initializers.zeros)
