"""Point sampling primitives: farthest point sampling + gather.

TPU-native equivalents of the reference's sampling CUDA kernels
(pcdet/ops/pointnet2/pointnet2_stack/src/sampling_gpu.cu: farthest point
sampling, stacked FPS, gather_points) used by the PV-RCNN/PointRCNN model
families. Sequential FPS is inherently iterative -> lax.fori_loop with O(N)
distance updates per step; everything is fixed-shape and jit/vmap friendly.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sampling(xyz: jnp.ndarray, npoint: int,
                            valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Select npoint indices by iterative farthest-point sampling.

    Args:
      xyz: (N, 3) points.
      valid: optional (N,) bool; invalid points are never selected.
    Returns:
      (npoint,) int32 indices (first index is 0 / first valid point).
    """
    n = xyz.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    big = jnp.asarray(1e10, xyz.dtype)
    # distance-to-selected-set, masked points pinned at -inf so argmax skips them
    first = jnp.argmax(valid)                      # first valid point

    def body(i, carry):
        dists, idxs = carry
        last = idxs[i - 1]
        d = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        dists = jnp.minimum(dists, d)
        cand = jnp.where(valid, dists, -big)
        nxt = jnp.argmax(cand).astype(jnp.int32)
        idxs = idxs.at[i].set(nxt)
        return dists, idxs

    dists0 = jnp.full((n,), big, xyz.dtype)
    idxs0 = jnp.zeros((npoint,), jnp.int32).at[0].set(first.astype(jnp.int32))
    _, idxs = jax.lax.fori_loop(1, npoint, body, (dists0, idxs0))
    return idxs


def stacked_farthest_point_sampling(xyz: jnp.ndarray, valid: jnp.ndarray,
                                    npoint: int) -> jnp.ndarray:
    """Batched FPS over (B, N, 3) with per-item masks -> (B, npoint)."""
    return jax.vmap(lambda p, v: farthest_point_sampling(p, npoint, v))(
        xyz, valid)


def gather_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """features (N, C), idx (...,) -> (..., C). grad = scatter-add (XLA)."""
    return features[idx]
