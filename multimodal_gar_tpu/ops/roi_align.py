"""RoIAlign as two small per-ROI matmuls (MXU-friendly separable bilinear).

Replaces torchvision.ops.roi_align as used at reference gat_model.py:1056
(output 5x5, spatial_scale=W_f/W, sampling_ratio=-1, aligned=False).

torchvision's adaptive sampling grid (ceil(roi_size/out_size) samples per bin)
is data-dependent, which XLA cannot compile. We keep exact semantics with
static shapes: evaluate a static MAX_SAMPLES grid per bin and mask samples
beyond the per-ROI adaptive count. Because bilinear interpolation is separable,
each ROI reduces to ``out = Ay @ F @ Ax^T`` with per-ROI interpolation matrices
Ay (out, H), Ax (out, W) — two dense matmuls instead of 4-corner gathers, which
maps onto the MXU instead of scattered HBM reads.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _axis_weights(start: float, bin_size: jnp.ndarray, grid_n: jnp.ndarray,
                  out_size: int, max_samples: int, dim: int) -> jnp.ndarray:
    """Interpolation matrix (out_size, dim) for one axis of one ROI.

    start: ROI start coordinate (scalar), bin_size: scalar, grid_n: adaptive
    sample count (<= max_samples), dim: feature-map extent on this axis.
    """
    o = jnp.arange(out_size, dtype=bin_size.dtype)                  # (out,)
    i = jnp.arange(max_samples, dtype=bin_size.dtype)               # (S,)
    # sample positions: start + o*bin + (i + .5) * bin/grid_n
    pos = start + o[:, None] * bin_size + (i[None, :] + 0.5) * bin_size / grid_n
    valid = (i[None, :] < grid_n) & (pos >= -1.0) & (pos <= dim)    # torchvision OOR rule
    pos_c = jnp.clip(pos, 0.0, dim - 1.0)
    grid = jnp.arange(dim, dtype=bin_size.dtype)                    # (dim,)
    # tent function = bilinear weight of sample at pos against integer grid
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos_c[:, :, None] - grid[None, None, :]))
    w = w * valid[:, :, None].astype(w.dtype)
    return jnp.sum(w, axis=1) / grid_n                              # (out, dim)


def _one_roi_matrices(box: jnp.ndarray, h: int, w: int, out_size: int,
                      max_samples: int, spatial_scale: float):
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    sx1, sy1 = x1 * spatial_scale, y1 * spatial_scale
    sx2, sy2 = x2 * spatial_scale, y2 * spatial_scale
    roi_w = jnp.maximum(sx2 - sx1, 1.0)       # aligned=False legacy clamp
    roi_h = jnp.maximum(sy2 - sy1, 1.0)
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size
    gw = jnp.clip(jnp.ceil(bin_w), 1, max_samples)
    gh = jnp.clip(jnp.ceil(bin_h), 1, max_samples)
    ay = _axis_weights(sy1, bin_h, gh, out_size, max_samples, h)    # (out, H)
    ax = _axis_weights(sx1, bin_w, gw, out_size, max_samples, w)    # (out, W)
    return ay, ax


@partial(jax.jit, static_argnames=("out_size", "max_samples", "spatial_scale"))
def roi_align(features: jnp.ndarray, boxes: jnp.ndarray, out_size: int = 5,
              spatial_scale: float = 1.0, max_samples: int = 4) -> jnp.ndarray:
    """RoIAlign on a single feature map.

    Args:
      features: (C, H, W) feature map.
      boxes: (N, 4) boxes in (x1, y1, x2, y2), input-image coordinates.
      out_size: output bins per side (reference crop_size=5).
      spatial_scale: feature-map stride scale (W_f / W).
      max_samples: static cap on adaptive samples-per-bin per axis; exact
        torchvision parity whenever ceil(bin_size) <= max_samples.

    Returns:
      (N, C, out_size, out_size) pooled features.
    """
    c, h, w = features.shape
    ay, ax = jax.vmap(
        lambda b: _one_roi_matrices(b, h, w, out_size, max_samples, spatial_scale)
    )(boxes.astype(features.dtype))                                  # (N,out,H), (N,out,W)
    # out[n, c, oy, ox] = sum_h sum_w ay[n,oy,h] F[c,h,w] ax[n,ox,w]
    tmp = jnp.einsum("noh,chw->nocw", ay, features)                  # (N, out, C, W)
    out = jnp.einsum("nocw,nmw->ncom", tmp, ax)                      # (N, C, out, out)
    return out
