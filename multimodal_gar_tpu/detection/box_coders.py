"""Box encode/decode between GT boxes and anchors/points.

Capability parity with pcdet/utils/box_coder_utils.py (ResidualCoder :5,
PreviousResidualDecoder :80, PreviousResidualRoIDecoder :112,
PointResidualCoder :144), as pure jnp functions — no mutable state, safe
under jit/vmap. Boxes are (..., 7+) = [x, y, z, dx, dy, dz, heading, ...].
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ResidualCoder:
    """Anchor-relative residual coder (box_coder_utils.py:5-77)."""
    code_size: int = 7
    encode_angle_by_sincos: bool = False

    @property
    def full_code_size(self) -> int:
        return self.code_size + (1 if self.encode_angle_by_sincos else 0)

    def encode(self, boxes: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
        anchors = jnp.concatenate(
            [anchors[..., :3], jnp.maximum(anchors[..., 3:6], 1e-5),
             anchors[..., 6:]], -1)
        boxes = jnp.concatenate(
            [boxes[..., :3], jnp.maximum(boxes[..., 3:6], 1e-5),
             boxes[..., 6:]], -1)
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, -1)
        xg, yg, zg, dxg, dyg, dzg, rg = jnp.split(boxes[..., :7], 7, -1)
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        xt = (xg - xa) / diag
        yt = (yg - ya) / diag
        zt = (zg - za) / dza
        dxt = jnp.log(dxg / dxa)
        dyt = jnp.log(dyg / dya)
        dzt = jnp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rts = [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            rts = [rg - ra]
        extras = [boxes[..., 7:] - anchors[..., 7:]] \
            if boxes.shape[-1] > 7 else []
        return jnp.concatenate([xt, yt, zt, dxt, dyt, dzt, *rts, *extras], -1)

    def decode(self, encodings: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, -1)
        if self.encode_angle_by_sincos:
            xt, yt, zt, dxt, dyt, dzt, cost, sint = jnp.split(
                encodings[..., :8], 8, -1)
            extras_in = encodings[..., 8:]
        else:
            xt, yt, zt, dxt, dyt, dzt, rt = jnp.split(encodings[..., :7], 7, -1)
            extras_in = encodings[..., 7:]
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diag + xa
        yg = yt * diag + ya
        zg = zt * dza + za
        dxg = jnp.exp(dxt) * dxa
        dyg = jnp.exp(dyt) * dya
        dzg = jnp.exp(dzt) * dza
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(sint + jnp.sin(ra), cost + jnp.cos(ra))
        else:
            rg = rt + ra
        extras = [extras_in + anchors[..., 7:]] \
            if anchors.shape[-1] > 7 else []
        return jnp.concatenate([xg, yg, zg, dxg, dyg, dzg, rg, *extras], -1)


@dataclasses.dataclass(frozen=True)
class PreviousResidualDecoder:
    """Legacy decode with (w, l, h) slot order (box_coder_utils.py:80-109)."""
    code_size: int = 7

    def decode(self, encodings: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, -1)
        xt, yt, zt, wt, lt, ht, rt = jnp.split(encodings[..., :7], 7, -1)
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        return jnp.concatenate([
            xt * diag + xa, yt * diag + ya, zt * dza + za,
            jnp.exp(lt) * dxa, jnp.exp(wt) * dya, jnp.exp(ht) * dza,
            rt + ra], -1)


@dataclasses.dataclass(frozen=True)
class PointResidualCoder:
    """Point-relative coder with per-class mean sizes
    (box_coder_utils.py:144-222). Heading always encoded as (cos, sin)."""
    code_size: int = 8
    use_mean_size: bool = True
    mean_size: Tuple[Tuple[float, float, float], ...] = (
        (3.9, 1.6, 1.56), (0.8, 0.6, 1.73), (1.76, 0.6, 1.73))

    def _sizes_for(self, classes: jnp.ndarray) -> jnp.ndarray:
        ms = jnp.asarray(self.mean_size, jnp.float32)            # (C, 3)
        return ms[jnp.clip(classes - 1, 0, ms.shape[0] - 1)]     # (..., 3)

    def encode(self, gt_boxes: jnp.ndarray, points: jnp.ndarray,
               gt_classes: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        gt_boxes = jnp.concatenate(
            [gt_boxes[..., :3], jnp.maximum(gt_boxes[..., 3:6], 1e-5),
             gt_boxes[..., 6:]], -1)
        xg, yg, zg, dxg, dyg, dzg, rg = jnp.split(gt_boxes[..., :7], 7, -1)
        xa, ya, za = jnp.split(points[..., :3], 3, -1)
        if self.use_mean_size:
            sz = self._sizes_for(gt_classes)
            dxa, dya, dza = sz[..., 0:1], sz[..., 1:2], sz[..., 2:3]
            diag = jnp.sqrt(dxa ** 2 + dya ** 2)
            xt, yt, zt = (xg - xa) / diag, (yg - ya) / diag, (zg - za) / dza
            dxt, dyt, dzt = (jnp.log(dxg / dxa), jnp.log(dyg / dya),
                             jnp.log(dzg / dza))
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = jnp.log(dxg), jnp.log(dyg), jnp.log(dzg)
        return jnp.concatenate(
            [xt, yt, zt, dxt, dyt, dzt, jnp.cos(rg), jnp.sin(rg),
             gt_boxes[..., 7:]], -1)

    def decode(self, encodings: jnp.ndarray, points: jnp.ndarray,
               pred_classes: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        xt, yt, zt, dxt, dyt, dzt, cost, sint = jnp.split(
            encodings[..., :8], 8, -1)
        xa, ya, za = jnp.split(points[..., :3], 3, -1)
        if self.use_mean_size:
            sz = self._sizes_for(pred_classes)
            dxa, dya, dza = sz[..., 0:1], sz[..., 1:2], sz[..., 2:3]
            diag = jnp.sqrt(dxa ** 2 + dya ** 2)
            xg, yg, zg = xt * diag + xa, yt * diag + ya, zt * dza + za
            dxg = jnp.exp(dxt) * dxa
            dyg = jnp.exp(dyt) * dya
            dzg = jnp.exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = jnp.exp(dxt), jnp.exp(dyt), jnp.exp(dzt)
        rg = jnp.arctan2(sint, cost)
        return jnp.concatenate([xg, yg, zg, dxg, dyg, dzg, rg,
                                encodings[..., 8:]], -1)
