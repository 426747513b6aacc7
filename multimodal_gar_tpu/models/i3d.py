"""Inception-v1 I3D video backbone in Flax (NDHWC layout).

Capability parity with reference model/backbone.py:99-425 (Unit3D same-padding
conv stacks, MaxPool3dSamePadding, InceptionModule, InceptionI3d endpoints),
redesigned for TPU: channels-last layout so XLA tiles the 3D convolutions onto
the MXU, TF-style 'SAME' padding natively (the torch code re-implements TF SAME
by hand; under static shapes flax's padding='SAME' is identical), optional
bfloat16 compute.

Frozen Kinetics-pretrained usage (reference gat_model.py:987-997): load
converted weights via ``i3d_convert.convert_torch_checkpoint`` and wrap the
apply in ``jax.lax.stop_gradient``.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# endpoint name -> builder order, matching reference VALID_ENDPOINTS
# (backbone.py:254-273).
VALID_ENDPOINTS = (
    "Conv3d_1a_7x7",
    "MaxPool3d_2a_3x3",
    "Conv3d_2b_1x1",
    "Conv3d_2c_3x3",
    "MaxPool3d_3a_3x3",
    "Mixed_3b",
    "Mixed_3c",
    "MaxPool3d_4a_3x3",
    "Mixed_4b",
    "Mixed_4c",
    "Mixed_4d",
    "Mixed_4e",
    "Mixed_4f",
    "MaxPool3d_5a_2x2",
    "Mixed_5b",
    "Mixed_5c",
)

# endpoint -> output channels (for downstream sizing)
ENDPOINT_CHANNELS = {
    "Mixed_3b": 256, "Mixed_3c": 480, "Mixed_4b": 512, "Mixed_4c": 512,
    "Mixed_4d": 512, "Mixed_4e": 528, "Mixed_4f": 832, "Mixed_5b": 832,
    "Mixed_5c": 1024,
}


class Unit3D(nn.Module):
    """Conv3D (SAME pad, no bias) + BatchNorm(eps=1e-3, momentum=0.01) + ReLU.

    Reference: backbone.py:134-206.
    """
    out_channels: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    use_batch_norm: bool = True
    use_bias: bool = False
    activation: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.out_channels, self.kernel, strides=self.stride,
                    padding="SAME", use_bias=self.use_bias, dtype=self.dtype,
                    name="conv3d")(x)
        if self.use_batch_norm:
            # torch momentum 0.01 == flax momentum 0.99
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                             momentum=0.99, dtype=self.dtype, name="bn")(x)
        if self.activation:
            x = nn.relu(x)
        return x


def max_pool_same(x: jnp.ndarray, window: Tuple[int, int, int],
                  strides: Tuple[int, int, int]) -> jnp.ndarray:
    """3D max pool with TF-SAME padding over (T, H, W) of an NDHWC tensor."""
    return nn.max_pool(x, window_shape=window, strides=strides, padding="SAME")


class InceptionModule(nn.Module):
    """Four-branch inception block (reference backbone.py:210-235)."""
    out_channels: Sequence[int]    # [b0, b1a, b1b, b2a, b2b, b3b]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        oc = self.out_channels
        b0 = Unit3D(oc[0], (1, 1, 1), dtype=self.dtype, name="b0")(x, train)
        b1 = Unit3D(oc[1], (1, 1, 1), dtype=self.dtype, name="b1a")(x, train)
        b1 = Unit3D(oc[2], (3, 3, 3), dtype=self.dtype, name="b1b")(b1, train)
        b2 = Unit3D(oc[3], (1, 1, 1), dtype=self.dtype, name="b2a")(x, train)
        b2 = Unit3D(oc[4], (3, 3, 3), dtype=self.dtype, name="b2b")(b2, train)
        b3 = max_pool_same(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(oc[5], (1, 1, 1), dtype=self.dtype, name="b3b")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


# module configs keyed by endpoint (reference backbone.py:307-376)
_INCEPTION_CFG = {
    "Mixed_3b": [64, 96, 128, 16, 32, 32],
    "Mixed_3c": [128, 128, 192, 32, 96, 64],
    "Mixed_4b": [192, 96, 208, 16, 48, 64],
    "Mixed_4c": [160, 112, 224, 24, 64, 64],
    "Mixed_4d": [128, 128, 256, 24, 64, 64],
    "Mixed_4e": [112, 144, 288, 32, 64, 64],
    "Mixed_4f": [256, 160, 320, 32, 128, 128],
    "Mixed_5b": [256, 160, 320, 32, 128, 128],
    "Mixed_5c": [384, 192, 384, 48, 128, 128],
}


class InceptionI3d(nn.Module):
    """I3D feature extractor up to ``final_endpoint``.

    Input: (B, T, H, W, 3) NDHWC clips. Output: (B, T', H', W', C') features.
    For final_endpoint='Mixed_4f' (the reference's config): spatial stride 16
    (conv1a + pool2a + pool3a + pool4a), temporal stride 4, C' = 832. A (15,
    720, 1280) clip yields (4, 45, 80, 832).
    """
    final_endpoint: str = "Mixed_4f"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        for ep in VALID_ENDPOINTS:
            if ep == "Conv3d_1a_7x7":
                x = Unit3D(64, (7, 7, 7), (2, 2, 2), dtype=d, name=ep)(x, train)
            elif ep == "MaxPool3d_2a_3x3":
                x = max_pool_same(x, (1, 3, 3), (1, 2, 2))
            elif ep == "Conv3d_2b_1x1":
                x = Unit3D(64, (1, 1, 1), dtype=d, name=ep)(x, train)
            elif ep == "Conv3d_2c_3x3":
                x = Unit3D(192, (3, 3, 3), dtype=d, name=ep)(x, train)
            elif ep == "MaxPool3d_3a_3x3":
                x = max_pool_same(x, (1, 3, 3), (1, 2, 2))
            elif ep == "MaxPool3d_4a_3x3":
                x = max_pool_same(x, (3, 3, 3), (2, 2, 2))
            elif ep == "MaxPool3d_5a_2x2":
                x = max_pool_same(x, (2, 2, 2), (2, 2, 2))
            else:
                x = InceptionModule(_INCEPTION_CFG[ep], dtype=d, name=ep)(x, train)
            if ep == self.final_endpoint:
                return x
        raise ValueError(f"unknown endpoint {self.final_endpoint}")
