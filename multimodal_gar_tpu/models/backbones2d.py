"""Alternative 2D image backbones: VGG16/19 and Inception-v3 feature stacks.

Capability parity with reference model/backbone.py:7-96 (MyInception_v3,
MyVGG16, MyVGG19 — torchvision wrappers, inactive under mil3.yaml but part of
the RGB-backbone capability surface). Implemented natively in Flax (NHWC);
weights can be converted from torchvision checkpoints with the same
transpose rule as i3d_convert.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# VGG configurations: channel per conv, 'M' = maxpool
_VGG16 = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
          512, 512, 512, "M", 512, 512, 512, "M")
_VGG19 = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
          512, 512, 512, 512, "M", 512, 512, 512, 512, "M")


class VGGFeatures(nn.Module):
    """VGG conv feature stack (torchvision vgg{16,19}.features equivalent)."""
    config: Tuple = _VGG16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        i = 0
        for c in self.config:
            if c == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
            else:
                x = nn.relu(nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                                    dtype=self.dtype, name=f"conv_{i}")(x))
                i += 1
        return [x]


def VGG16(dtype=jnp.float32) -> VGGFeatures:
    return VGGFeatures(config=_VGG16, dtype=dtype, name="vgg16")


def VGG19(dtype=jnp.float32) -> VGGFeatures:
    return VGGFeatures(config=_VGG19, dtype=dtype, name="vgg19")


class _ConvBN(nn.Module):
    out: int
    kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    padding: Any = "VALID"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.out, self.kernel, self.stride, padding=self.padding,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class _InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b1 = _ConvBN(64, (1, 1), dtype=self.dtype, name="b1x1")(x, train)
        b5 = _ConvBN(48, (1, 1), dtype=self.dtype, name="b5x5_1")(x, train)
        b5 = _ConvBN(64, (5, 5), padding="SAME", dtype=self.dtype,
                     name="b5x5_2")(b5, train)
        b3 = _ConvBN(64, (1, 1), dtype=self.dtype, name="b3x3dbl_1")(x, train)
        b3 = _ConvBN(96, (3, 3), padding="SAME", dtype=self.dtype,
                     name="b3x3dbl_2")(b3, train)
        b3 = _ConvBN(96, (3, 3), padding="SAME", dtype=self.dtype,
                     name="b3x3dbl_3")(b3, train)
        bp = nn.avg_pool(x, (3, 3), (1, 1), padding="SAME")
        bp = _ConvBN(self.pool_features, (1, 1), dtype=self.dtype,
                     name="bpool")(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], -1)


class _InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b3 = _ConvBN(384, (3, 3), (2, 2), dtype=self.dtype, name="b3x3")(x, train)
        bd = _ConvBN(64, (1, 1), dtype=self.dtype, name="b3x3dbl_1")(x, train)
        bd = _ConvBN(96, (3, 3), padding="SAME", dtype=self.dtype,
                     name="b3x3dbl_2")(bd, train)
        bd = _ConvBN(96, (3, 3), (2, 2), dtype=self.dtype,
                     name="b3x3dbl_3")(bd, train)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, bd, bp], -1)


class _InceptionC(nn.Module):
    c7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b1 = _ConvBN(192, (1, 1), dtype=self.dtype, name="b1x1")(x, train)
        b7 = _ConvBN(self.c7, (1, 1), dtype=self.dtype, name="b7_1")(x, train)
        b7 = _ConvBN(self.c7, (1, 7), padding="SAME", dtype=self.dtype,
                     name="b7_2")(b7, train)
        b7 = _ConvBN(192, (7, 1), padding="SAME", dtype=self.dtype,
                     name="b7_3")(b7, train)
        bd = _ConvBN(self.c7, (1, 1), dtype=self.dtype, name="b7dbl_1")(x, train)
        bd = _ConvBN(self.c7, (7, 1), padding="SAME", dtype=self.dtype,
                     name="b7dbl_2")(bd, train)
        bd = _ConvBN(self.c7, (1, 7), padding="SAME", dtype=self.dtype,
                     name="b7dbl_3")(bd, train)
        bd = _ConvBN(self.c7, (7, 1), padding="SAME", dtype=self.dtype,
                     name="b7dbl_4")(bd, train)
        bd = _ConvBN(192, (1, 7), padding="SAME", dtype=self.dtype,
                     name="b7dbl_5")(bd, train)
        bp = nn.avg_pool(x, (3, 3), (1, 1), padding="SAME")
        bp = _ConvBN(192, (1, 1), dtype=self.dtype, name="bpool")(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], -1)


class InceptionV3Features(nn.Module):
    """Inception-v3 feature extractor up to Mixed_6e (MyInception_v3 parity:
    returns [Mixed_5d (288ch, /8), Mixed_6e (768ch, /16)])."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        d = self.dtype
        x = _ConvBN(32, (3, 3), (2, 2), dtype=d, name="Conv2d_1a")(x, train)
        x = _ConvBN(32, (3, 3), dtype=d, name="Conv2d_2a")(x, train)
        x = _ConvBN(64, (3, 3), padding="SAME", dtype=d, name="Conv2d_2b")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = _ConvBN(80, (1, 1), dtype=d, name="Conv2d_3b")(x, train)
        x = _ConvBN(192, (3, 3), dtype=d, name="Conv2d_4a")(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = _InceptionA(32, dtype=d, name="Mixed_5b")(x, train)
        x = _InceptionA(64, dtype=d, name="Mixed_5c")(x, train)
        x = _InceptionA(64, dtype=d, name="Mixed_5d")(x, train)
        out1 = x
        x = _InceptionB(dtype=d, name="Mixed_6a")(x, train)
        x = _InceptionC(128, dtype=d, name="Mixed_6b")(x, train)
        x = _InceptionC(160, dtype=d, name="Mixed_6c")(x, train)
        x = _InceptionC(160, dtype=d, name="Mixed_6d")(x, train)
        x = _InceptionC(192, dtype=d, name="Mixed_6e")(x, train)
        return [out1, x]
