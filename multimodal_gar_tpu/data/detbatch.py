"""Shared fixed-shape DetBatch assembly for the detection-zoo adapters.

The pcdet analogue is DatasetTemplate.prepare_data + collate_batch
(pcdet/datasets/dataset.py:13, dataloader.py:295-419): voxelize, pad every
ragged field to a static cap, and prepend batch indices. Here the padded
fields carry explicit validity masks instead (CLAUDE.md conventions), and
the host also builds the sparse-conv rulebooks the gather-GEMM backbone
consumes (data/rulebook.py).

Used by data/kitti.py, data/nuscenes.py, data/once.py callers; any frame
provider with `frame(idx) -> {"points", "gt_boxes", "gt_classes"}` plus a
`range` attribute can assemble batches through `assemble_det_batch`.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np


def assemble_det_batch(dataset, indices: Sequence[int], voxel_size,
                       max_voxels: int, max_points_per_voxel: int = 5,
                       max_points: int = 16384, max_gt: int = 50,
                       rulebook_caps=None, num_features: int = 4,
                       x_window: bool = False):
    """Voxelize + pad `dataset.frame(idx)` outputs into one DetBatch.

    x_window: also emit the packed x-window maps (only needed when the
    consuming detector sets DetectorConfig.x_window; skipped by default to
    keep the 1-core host pipeline lean).
    """
    import jax.numpy as jnp

    from ..detection.detectors import DetBatch
    from .rulebook import build_rulebook
    from .voxelizer import Voxelizer

    rng = dataset.range
    b = len(indices)
    nx, ny, nz = [int(round((rng[i + 3] - rng[i]) / voxel_size[i]))
                  for i in range(3)]
    vx = np.zeros((b, max_voxels, max_points_per_voxel, num_features),
                  np.float32)
    vc = np.full((b, max_voxels, 3), -1, np.int32)
    vn = np.zeros((b, max_voxels), np.int32)
    vv = np.zeros((b, max_voxels), bool)
    pts_pad = np.zeros((b, max_points, num_features), np.float32)
    pts_valid = np.zeros((b, max_points), bool)
    gt = np.zeros((b, max_gt, 7), np.float32)
    gtc = np.zeros((b, max_gt), np.int32)
    gtv = np.zeros((b, max_gt), bool)
    rbs = []
    caps = rulebook_caps or (max_voxels, max_voxels, max_voxels // 2,
                             max_voxels // 4)
    voxelizer = Voxelizer(voxel_size, rng, max_points_per_voxel, max_voxels)
    for i, idx in enumerate(indices):
        fr = dataset.frame(idx)
        p = fr["points"][:max_points, :num_features]
        pts_pad[i, :len(p)] = p
        pts_valid[i, :len(p)] = True
        voxels, coords, num = voxelizer(fr["points"][:, :num_features])
        n = len(voxels)
        vx[i, :n], vc[i, :n], vn[i, :n] = voxels, coords, num
        vv[i, :n] = True
        g = fr["gt_boxes"][:max_gt]
        gt[i, :len(g)] = g[:, :7]
        gtc[i, :len(g)] = fr["gt_classes"][:max_gt]
        gtv[i, :len(g)] = True
        rbs.append(build_rulebook(vc[i], n, (nz + 1, ny, nx), caps,
                                  x_window=x_window))
    rulebook = {k: jnp.asarray(np.stack([rb[k] for rb in rbs]))
                for k in rbs[0]}
    return DetBatch(
        voxels=jnp.asarray(vx), voxel_coords=jnp.asarray(vc),
        voxel_num_points=jnp.asarray(vn), voxel_valid=jnp.asarray(vv),
        gt_boxes=jnp.asarray(gt), gt_classes=jnp.asarray(gtc),
        gt_valid=jnp.asarray(gtv), rulebook=rulebook,
        points=jnp.asarray(pts_pad), point_valid=jnp.asarray(pts_valid))
