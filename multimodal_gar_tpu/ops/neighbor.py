"""Neighborhood primitives: ball query, kNN interpolation, grouping.

TPU-native equivalents of the reference's pointnet2 CUDA kernels
(pcdet/ops/pointnet2/pointnet2_stack/src/ball_query_gpu.cu,
interpolate_gpu.cu, group_points_gpu.cu) used by the PV-RCNN family:
masked pairwise distances + top-k instead of per-thread scans; gathers whose
backward is XLA's scatter-add (replacing the hand-written atomicAdd grads).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .geometry import safe_sqrt


@partial(jax.jit, static_argnames=("nsample",))
def ball_query(radius: float, nsample: int, xyz: jnp.ndarray,
               new_xyz: jnp.ndarray,
               valid: jnp.ndarray | None = None):
    """For each query, indices of up to nsample points within radius.

    Matches the CUDA kernel's semantics: first nsample hits in point order,
    remaining slots filled with the first hit; empty balls flagged.

    Args:
      xyz: (N, 3) support points; new_xyz: (M, 3) queries.
      valid: optional (N,) support mask.
    Returns:
      idx (M, nsample) int32, empty (M,) bool.
    """
    n = xyz.shape[0]
    d2 = jnp.sum((new_xyz[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
    hit = d2 < radius * radius
    if valid is not None:
        hit = hit & valid[None, :]
    order = jnp.arange(n, dtype=jnp.int32)
    priority = jnp.where(hit, order[None, :], n)
    _, pos = jax.lax.top_k(-priority, nsample)
    chosen_valid = jnp.take_along_axis(priority, pos, axis=1) < n
    idx = pos.astype(jnp.int32)
    first = idx[:, :1]
    idx = jnp.where(chosen_valid, idx, first)
    empty = ~chosen_valid[:, 0]
    return jnp.where(empty[:, None], 0, idx), empty


def three_nn(unknown: jnp.ndarray, known: jnp.ndarray,
             known_valid: jnp.ndarray | None = None):
    """3 nearest neighbors of each unknown point among known points.

    Returns (dist (M, 3), idx (M, 3)) like interpolate_gpu.cu's three_nn.
    """
    d2 = jnp.sum((unknown[:, None, :] - known[None, :, :]) ** 2, axis=-1)
    if known_valid is not None:
        d2 = jnp.where(known_valid[None, :], d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, 3)
    # safe_sqrt per CLAUDE.md: in FP paths every known point is also a
    # query, so the nearest distance is exactly 0 and sqrt'(0)=inf would
    # NaN any gradient through the interpolation weights
    return safe_sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray,
                      dist: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Inverse-distance weighted interpolation of (N, C) features at idx/dist
    from three_nn -> (M, C)."""
    w = 1.0 / jnp.maximum(dist * dist, eps)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return jnp.einsum("mk,mkc->mc", w, features[idx])


def grouping_operation(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather (N, C) features by (M, S) indices -> (M, S, C).

    group_points_gpu.cu equivalent; backward is XLA scatter-add."""
    return features[idx]
