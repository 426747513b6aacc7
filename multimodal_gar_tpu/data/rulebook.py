"""Host-side sparse-convolution rulebook construction.

The sparse backbone's index structures — submanifold neighbor maps, strided
downsample active sets, and downsample gather maps — are pure functions of the
voxel coordinates, which the host voxelizer already produced. Building them on
the device cost ~60 ms/step at flagship shapes (sorts + sort-joins); building
them HERE (numpy / C++ in the data pipeline, overlapped with TPU compute)
removes that entirely from the jit step. This mirrors what spconv's rulebook
builder does for the reference, relocated to the input pipeline where it
pipelines for free.

Layout per stage k (see models/sparse_backbone.py for consumption):
  coords_k   (M_k, 3) int32 zyx        voxel coords of the stage's active set
  valid_k    (M_k,)  bool
  nbr_k      (M_k, 27) int32           submanifold 3^3 neighbor rows (-1 absent)
  down_k     (M_k, 27) int32           rows into stage k-1 feeding each output
                                       (strided 3^3 taps; -1 absent; k >= 1)
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

# stage schedule of VoxelBackBone8x (reference spconv_backbone.py:84-117)
STAGE_STRIDES = (1, 2, 2, 2)                 # stage k downsamples by this
STAGE_PADDINGS = ((1, 1, 1), (1, 1, 1), (1, 1, 1), (0, 1, 1))
KERNEL_SIZE = 3


def _linear_keys(coords: np.ndarray, shape: Tuple[int, int, int]) -> np.ndarray:
    z, y, x = coords[:, 0], coords[:, 1], coords[:, 2]
    return (z.astype(np.int64) * shape[1] + y) * shape[2] + x


def _lookup(sorted_keys: np.ndarray, perm: np.ndarray,
            query_keys: np.ndarray, query_ok: np.ndarray) -> np.ndarray:
    pos = np.searchsorted(sorted_keys, query_keys)
    pos = np.clip(pos, 0, max(len(sorted_keys) - 1, 0))
    hit = query_ok & (len(sorted_keys) > 0)
    if len(sorted_keys):
        hit = hit & (sorted_keys[pos] == query_keys)
    return np.where(hit, perm[np.clip(pos, 0, None)], -1).astype(np.int32)


def _kernel_offsets_centered() -> np.ndarray:
    g = np.arange(-1, 2)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    return np.stack([zz.ravel(), yy.ravel(), xx.ravel()], -1)     # (27, 3)


def _kernel_offsets_corner() -> np.ndarray:
    g = np.arange(KERNEL_SIZE)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    return np.stack([zz.ravel(), yy.ravel(), xx.ravel()], -1)     # (27, 3)


def _subm_neighbors(coords: np.ndarray, n_valid: int,
                    shape: Tuple[int, int, int], max_rows: int) -> np.ndarray:
    """(max_rows, 27) neighbor rows for the submanifold 3^3 conv."""
    out = np.full((max_rows, 27), -1, np.int32)
    if n_valid == 0:
        return out
    c = coords[:n_valid]
    keys = _linear_keys(c, shape)
    perm = np.argsort(keys, kind="stable")
    skeys = keys[perm]
    offs = _kernel_offsets_centered()
    nbr = c[:, None, :] + offs[None, :, :]                        # (M, 27, 3)
    ok = np.all((nbr >= 0) & (nbr < np.asarray(shape)), axis=-1)
    qkeys = _linear_keys(nbr.reshape(-1, 3), shape)
    out[:n_valid] = _lookup(skeys, perm.astype(np.int32), qkeys,
                            ok.reshape(-1)).reshape(n_valid, 27)
    return out


def _downsample(coords: np.ndarray, n_valid: int,
                in_shape: Tuple[int, int, int], stride: int,
                padding: Tuple[int, int, int], max_out: int):
    """Derive the strided-conv output active set + gather map.

    spconv.SparseConv3d semantics (kernel 3): output o is active iff some
    input i = o*stride - pad + k is active. Output voxels ordered by linear
    key (deterministic).
    """
    out_shape = tuple((d + 2 * p - KERNEL_SIZE) // stride + 1
                      for d, p in zip(in_shape, padding))
    out_coords = np.full((max_out, 3), -1, np.int32)
    down = np.full((max_out, 27), -1, np.int32)
    if n_valid == 0:
        return out_coords, 0, down, out_shape

    c = coords[:n_valid]
    p = np.asarray(padding)
    koffs = _kernel_offsets_corner()                              # (27, 3)
    num = c[:, None, :] + p[None, None, :] - koffs[None, :, :]    # (M, 27, 3)
    o = num // stride
    exact = np.all(o * stride == num, axis=-1)
    in_range = np.all((o >= 0) & (o < np.asarray(out_shape)), axis=-1)
    ok = exact & in_range
    cand = o[ok]
    keys = np.unique(_linear_keys(cand, out_shape))
    n_out = min(len(keys), max_out)
    keys = keys[:n_out]
    oz = keys // (out_shape[1] * out_shape[2])
    oy = (keys // out_shape[2]) % out_shape[1]
    ox = keys % out_shape[2]
    out_coords[:n_out] = np.stack([oz, oy, ox], -1)

    # gather map: input row feeding output o at tap k: i = o*stride - pad + k
    in_keys = _linear_keys(c, in_shape)
    perm = np.argsort(in_keys, kind="stable")
    skeys = in_keys[perm]
    src = (out_coords[:n_out, None, :] * stride - p[None, None, :]
           + koffs[None, :, :])                                   # (Mo, 27, 3)
    ok_src = np.all((src >= 0) & (src < np.asarray(in_shape)), axis=-1)
    qkeys = _linear_keys(src.reshape(-1, 3), in_shape)
    down[:n_out] = _lookup(skeys, perm.astype(np.int32), qkeys,
                           ok_src.reshape(-1)).reshape(n_out, 27)
    return out_coords, n_out, down, out_shape


def build_rulebook(coords: np.ndarray, n_valid: int,
                   spatial_shape: Tuple[int, int, int],
                   max_voxels_per_stage: Sequence[int]) -> Dict[str, np.ndarray]:
    """Full 4-stage rulebook for VoxelBackbone8x from stage-0 voxel coords.

    Args:
      coords: (M0, 3) int32 zyx (padded rows arbitrary).
      n_valid: number of real voxels.
      spatial_shape: stage-0 (Z, Y, X).
      max_voxels_per_stage: static caps (M0..M3).
    Returns:
      flat dict of numpy arrays: coords_k, count_k, nbr_k, down_k (k=1..3).
    """
    try:
        from ..native import native_rulebook
        res = native_rulebook(coords, n_valid, spatial_shape,
                              tuple(max_voxels_per_stage))
        if res is not None:
            return res
    except ImportError:
        pass

    out: Dict[str, np.ndarray] = {}
    cur_coords = coords[:max_voxels_per_stage[0]]
    cur_valid = n_valid
    cur_shape = spatial_shape
    for k in range(4):
        cap = max_voxels_per_stage[k]
        if k > 0:
            new_coords, new_valid, down, new_shape = _downsample(
                cur_coords, cur_valid, cur_shape, STAGE_STRIDES[k],
                STAGE_PADDINGS[k], cap)
            out[f"down_{k}"] = down
            cur_coords, cur_valid, cur_shape = new_coords, new_valid, new_shape
            out[f"coords_{k}"] = cur_coords
            out[f"count_{k}"] = np.int32(cur_valid)
        out[f"nbr_{k}"] = _subm_neighbors(cur_coords, cur_valid, cur_shape, cap)
    return out
