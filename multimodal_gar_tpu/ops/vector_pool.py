"""Vector pooling: local-grid neighborhood aggregation (PV-RCNN++ family).

TPU-native equivalent of the reference's vector_pool CUDA kernels
(pcdet/ops/pointnet2/pointnet2_stack/src/vector_pool_gpu.cu:485, wrapped by
VectorPoolAggregation) — the local-vector representation of a query's
neighborhood: the ball around each query is split into a dense_x^3 sub-voxel
grid; support points are average-pooled per sub-voxel, and the per-cell means
(with relative offsets) are concatenated into one fixed-length vector.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("grid_size",))
def vector_pool(support_xyz: jnp.ndarray, support_features: jnp.ndarray,
                support_valid: jnp.ndarray, query_xyz: jnp.ndarray,
                radius: float, grid_size: int = 3
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Aggregate support features into a per-query local sub-voxel grid.

    Args:
      support_xyz: (N, 3); support_features: (N, C); support_valid: (N,).
      query_xyz: (M, 3) query centers.
      radius: half-extent of the cubic neighborhood.
      grid_size: sub-voxels per axis (reference dense voxel count).
    Returns:
      pooled: (M, grid_size^3, 3 + C) — mean relative-offset ++ mean feature
        per sub-voxel (zeros where empty);
      counts: (M, grid_size^3) int32 points per cell.
    """
    m = query_xyz.shape[0]
    g3 = grid_size ** 3
    cell = 2.0 * radius / grid_size

    rel = support_xyz[None, :, :] - query_xyz[:, None, :]          # (M, N, 3)
    inside = jnp.all(jnp.abs(rel) < radius, axis=-1) & support_valid[None, :]
    cell_idx = jnp.clip(jnp.floor((rel + radius) / cell), 0,
                        grid_size - 1).astype(jnp.int32)
    flat = (cell_idx[..., 0] * grid_size + cell_idx[..., 1]) * grid_size \
        + cell_idx[..., 2]
    flat = jnp.where(inside, flat, g3)                             # dump bin

    def per_query(f, r, feats_ok):
        vals = jnp.concatenate([r, feats_ok], axis=-1)             # (N, 3+C)
        sums = jnp.zeros((g3 + 1, vals.shape[-1]), vals.dtype).at[f].add(vals)
        cnt = jnp.zeros((g3 + 1,), jnp.int32).at[f].add(1)
        mean = sums / jnp.maximum(cnt[:, None], 1)
        return mean[:g3], cnt[:g3]

    feats_b = jnp.broadcast_to(support_features[None],
                               (m,) + support_features.shape)
    pooled, counts = jax.vmap(per_query)(flat, rel, feats_b)
    return pooled, counts
