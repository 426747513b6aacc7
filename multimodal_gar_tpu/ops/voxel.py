"""Sparse-voxel index machinery, TPU-native.

The reference relies on three CUDA/C++ pieces for its LiDAR path:
  1. spconv's rulebook construction for sparse 3D convolution (external lib),
  2. ``generate_voxel2pinds`` — a dense (B, Z, Y, X) voxel->row index tensor
     (pcdet/utils/common_utils.py:244-252),
  3. the ``voxel_query`` + ``group_points`` kernels
     (pcdet/ops/pointnet2/pointnet2_stack/src/voxel_query_gpu.cu,
      group_points_gpu.cu).

A dense index grid is hostile to TPUs at stride 1 (2000x2000x40 int32 = 640 MB).
Instead every lookup here goes through *sorted linear keys + binary search*
(jnp.searchsorted), which is fixed-shape, O(log M) per probe, fuses into the
surrounding XLA program, and needs only O(M) memory. All voxel sets are padded
to a static MAX_VOXELS with validity masks.

Coordinates follow the spconv convention: (z, y, x) int32, one set per batch
item (vmap over batch), spatial_shape = (Z, Y, X).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

INVALID_KEY = jnp.iinfo(jnp.int32).max


class VoxelLookup(NamedTuple):
    """Sorted-key lookup table over one item's active voxels."""
    sorted_keys: jnp.ndarray   # (M,) int32, invalid rows pushed to the end
    perm: jnp.ndarray          # (M,) int32: sorted position -> original row


def linear_keys(coords: jnp.ndarray, valid: jnp.ndarray,
                spatial_shape: Tuple[int, int, int]) -> jnp.ndarray:
    """Linearize (M, 3) zyx coords into int32 keys; invalid/out-of-range -> INVALID_KEY."""
    zdim, ydim, xdim = spatial_shape
    z, y, x = coords[:, 0], coords[:, 1], coords[:, 2]
    in_range = ((z >= 0) & (z < zdim) & (y >= 0) & (y < ydim)
                & (x >= 0) & (x < xdim) & valid)
    key = (z * ydim + y) * xdim + x
    return jnp.where(in_range, key, INVALID_KEY).astype(jnp.int32)


def build_lookup(coords: jnp.ndarray, valid: jnp.ndarray,
                 spatial_shape: Tuple[int, int, int]) -> VoxelLookup:
    keys = linear_keys(coords, valid, spatial_shape)
    perm = jnp.argsort(keys)
    return VoxelLookup(sorted_keys=keys[perm], perm=perm.astype(jnp.int32))


def lookup(table: VoxelLookup, query_coords: jnp.ndarray, query_valid: jnp.ndarray,
           spatial_shape: Tuple[int, int, int]) -> jnp.ndarray:
    """Find the voxel row holding each query coord; -1 if absent.

    query_coords: (..., 3) zyx. Returns (...,) int32 row indices into the
    original (unsorted) voxel arrays.
    """
    flat = query_coords.reshape(-1, 3)
    qkeys = linear_keys(flat, query_valid.reshape(-1), spatial_shape)
    pos = jnp.searchsorted(table.sorted_keys, qkeys)
    pos = jnp.clip(pos, 0, table.sorted_keys.shape[0] - 1)
    hit = (table.sorted_keys[pos] == qkeys) & (qkeys != INVALID_KEY)
    idx = jnp.where(hit, table.perm[pos], -1)
    return idx.reshape(query_coords.shape[:-1])


def kernel_offsets(kernel_size: int = 3) -> jnp.ndarray:
    """(K^3, 3) zyx offsets in scan order (z outer, x inner), centered."""
    r = kernel_size // 2
    g = jnp.arange(-r, kernel_size - r)
    zz, yy, xx = jnp.meshgrid(g, g, g, indexing="ij")
    return jnp.stack([zz.ravel(), yy.ravel(), xx.ravel()], axis=-1).astype(jnp.int32)


def window_offsets(ranges: Tuple[int, int, int]) -> jnp.ndarray:
    """(prod(2r+1), 3) zyx offsets scanning z, then y, then x — identical scan
    order to the reference voxel_query CUDA kernel (voxel_query_gpu.cu:10-89),
    which determines which neighbors fill the first ``nsample`` slots."""
    rz, ry, rx = ranges
    z = jnp.arange(-rz, rz + 1)
    y = jnp.arange(-ry, ry + 1)
    x = jnp.arange(-rx, rx + 1)
    zz, yy, xx = jnp.meshgrid(z, y, x, indexing="ij")
    return jnp.stack([zz.ravel(), yy.ravel(), xx.ravel()], axis=-1).astype(jnp.int32)


def get_voxel_centers(coords_zyx: jnp.ndarray, downsample_times: int,
                      voxel_size: Sequence[float],
                      point_cloud_range: Sequence[float]) -> jnp.ndarray:
    """Voxel centers in xyz metric space (reference common_utils.py:66-80)."""
    vs = jnp.asarray(voxel_size, jnp.float32) * downsample_times
    pc_min = jnp.asarray(point_cloud_range[:3], jnp.float32)
    xyz = coords_zyx[:, ::-1].astype(jnp.float32)   # zyx -> xyz
    return (xyz + 0.5) * vs + pc_min


def voxel_query(table: VoxelLookup,
                voxel_centers: jnp.ndarray,
                query_xyz: jnp.ndarray,
                query_coords: jnp.ndarray,
                query_valid: jnp.ndarray,
                spatial_shape: Tuple[int, int, int],
                ranges: Tuple[int, int, int],
                radius: float,
                nsample: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Collect up to ``nsample`` neighbor-voxel rows for each query point.

    TPU-native equivalent of voxel_query_gpu.cu: scan a (2rz+1)(2ry+1)(2rx+1)
    window around each query's voxel coord in z/y/x order, keep voxels whose
    center lies within ``radius`` of the query xyz, take the first ``nsample``
    in scan order, pad the remainder with the first hit.

    Args:
      table: lookup over the scale's active voxels.
      voxel_centers: (M, 3) xyz centers of active voxels.
      query_xyz: (R, 3) query points (metric).
      query_coords: (R, 3) zyx voxel coords of queries at this scale.
      query_valid: (R,) bool.
    Returns:
      idx: (R, nsample) int32 rows into the voxel arrays (0 where empty).
      empty: (R,) bool — True when no neighbor was found (or query invalid).
    """
    offs = window_offsets(ranges)                                  # (W, 3)
    wsize = offs.shape[0]
    cand_coords = query_coords[:, None, :] + offs[None, :, :]      # (R, W, 3)
    cand_valid = jnp.broadcast_to(query_valid[:, None], cand_coords.shape[:2])
    cand_idx = lookup(table, cand_coords, cand_valid, spatial_shape)  # (R, W)
    hit = cand_idx >= 0
    centers = voxel_centers[jnp.clip(cand_idx, 0), :]              # (R, W, 3)
    d2 = jnp.sum((centers - query_xyz[:, None, :]) ** 2, axis=-1)
    hit = hit & (d2 < radius * radius)

    order = jnp.arange(wsize, dtype=jnp.int32)
    priority = jnp.where(hit, order[None, :], wsize)               # (R, W)
    neg_top, pos = jax.lax.top_k(-priority, nsample)               # smallest priorities
    chosen_valid = (-neg_top) < wsize                              # (R, nsample)
    chosen_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    first_hit = chosen_idx[:, :1]                                  # slot 0 = first hit
    idx = jnp.where(chosen_valid, chosen_idx, first_hit)
    empty = ~chosen_valid[:, 0]
    idx = jnp.where(empty[:, None], 0, idx)
    return idx.astype(jnp.int32), empty
