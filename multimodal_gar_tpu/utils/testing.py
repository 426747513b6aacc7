"""Synthetic fixtures: tiny configs and random-but-consistent batches.

Used by the test suite, __graft_entry__.py and bench.py. This is the synthetic
mini-JRDB stand-in (SURVEY.md §4c) until the real data pipeline lands.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..config import (Config, DataConfig, LiDARBackboneConfig,
                                       PointCloudConfig, PoolLayerConfig,
                                       VoxelizationConfig)
from ..types import Batch


def tiny_config(num_people: int = 8, num_frames: int = 3,
                image_hw=(48, 64), max_voxels: int = 256) -> Config:
    """A miniature config that exercises every code path cheaply."""
    cfg = Config()
    pc = PointCloudConfig(
        num_points=256,
        range=(-8.0, -8.0, -2.0, 8.0, 8.0, 3.0),
        voxel=VoxelizationConfig(voxel_size=(0.5, 0.5, 0.625),
                                 max_voxels_train=max_voxels,
                                 max_voxels_test=max_voxels),
    )
    data = dataclasses.replace(
        cfg.data, image_size=image_hw, num_frames=num_frames,
        num_boxes=num_people, point_cloud=pc)
    lidar = dataclasses.replace(
        cfg.model.lidar,
        max_voxels_per_stage=(max_voxels, max_voxels // 2, max_voxels // 4,
                              max_voxels // 8),
        pool_layers=(
            PoolLayerConfig("x_conv2", (8, 8), (2, 2, 2), 1.0, 4),
            PoolLayerConfig("x_conv4", (8, 8), (2, 2, 2), 4.0, 4),
        ),
        grid_pool_size=2,
    )
    model = dataclasses.replace(cfg.model, lidar=lidar)
    return dataclasses.replace(cfg, data=data, model=model)


def flagship_config(dtype: str = "float32", max_voxels: int = 40000) -> Config:
    """The reference's full EVAL working point (mil3.yaml): 720x1280 panorama,
    15 frames, 100 actor slots, 40k voxels over a 200x200x50 m range.

    The reference caps voxels at 16k for train but 40,000 at test time
    (reference Multimodal_cfg/mil3.yaml:56-60: MAX_NUMBER_OF_VOXELS
    {train: 16000, test: 40000}); throughput/MFU must be quoted at the test
    cap. Pass ``max_voxels=16000`` for the train-cap point (rounds 1-3
    continuity numbers were measured there).

    Shared by __graft_entry__.entry() and bench.py so the compile-checked
    model and the benchmarked model are identical.
    """
    cfg = Config()
    pc = PointCloudConfig(
        num_points=35000,
        range=(-100.0, -100.0, -25.0, 100.0, 100.0, 25.0),
        voxel=VoxelizationConfig((0.1, 0.1, 1.25), 5, max_voxels, max_voxels),
    )
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, image_size=(720, 1280), num_frames=15, num_boxes=100,
        point_cloud=pc))
    # sparse-stage caps sized to the voxel cap (at 16k: the round-1..3 tuple)
    stage_caps = (max_voxels, max_voxels, max_voxels // 2, max_voxels // 4)
    return dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, dtype=dtype, lidar=dataclasses.replace(
            cfg.model.lidar, max_voxels_per_stage=stage_caps)))


def synthetic_batch(cfg: Config, batch_size: int = 1, seed: int = 0,
                    n_valid: int | None = None) -> Batch:
    """Random but internally consistent padded batch."""
    rng = np.random.default_rng(seed)
    d = cfg.data
    pc = d.point_cloud
    h, w = d.image_size
    n = d.num_boxes
    t = d.num_frames
    m = pc.voxel.max_voxels_train
    p = pc.voxel.max_points_per_voxel
    nv = n_valid if n_valid is not None else max(2, n // 2)

    images = rng.normal(size=(batch_size, t, h, w, 3)).astype(np.float32)

    boxes2d = np.zeros((batch_size, n, 4), np.float32)
    xy = rng.uniform(0, [w - 20, h - 20], size=(batch_size, n, 2))
    wh = rng.uniform(5, 20, size=(batch_size, n, 2))
    boxes2d[..., :2] = xy
    boxes2d[..., 2:] = xy + wh

    boxes3d = np.zeros((batch_size, n, 7), np.float32)
    boxes3d[..., 0:2] = rng.uniform(pc.range[0] + 2, pc.range[3] - 2,
                                    size=(batch_size, n, 2))
    boxes3d[..., 2] = rng.uniform(-0.5, 0.5, size=(batch_size, n))
    boxes3d[..., 3:6] = rng.uniform(0.5, 1.5, size=(batch_size, n, 3))
    boxes3d[..., 6] = rng.uniform(-np.pi, np.pi, size=(batch_size, n))

    valid = np.zeros((batch_size, n), bool)
    valid[:, :nv] = True
    boxes2d *= valid[..., None]
    boxes3d *= valid[..., None]

    sgid = rng.integers(0, max(nv // 2, 1), size=(batch_size, n)).astype(np.int32)
    sgid[~valid] = -1
    actions = (rng.uniform(size=(batch_size, n, 27)) < 0.15).astype(np.float32)
    actions *= valid[..., None]
    activity = (rng.uniform(size=(batch_size, n, 27)) < 0.15).astype(np.float32)
    activity *= valid[..., None]

    # voxels: random in-range points, consistent coords
    nx, ny, nz = pc.grid_size
    mv = max(m // 2, 1)
    pts = rng.uniform(
        low=[pc.range[0], pc.range[1], pc.range[2], 0],
        high=[pc.range[3], pc.range[4], pc.range[5], 1],
        size=(batch_size, m, p, 4)).astype(np.float32)
    vs = np.asarray(pc.voxel.voxel_size)
    coords_xyz = ((pts[:, :, 0, :3] - np.asarray(pc.range[:3])) // vs).astype(np.int32)
    coords_xyz = np.clip(coords_xyz, 0, np.asarray([nx - 1, ny - 1, nz - 1]))
    coords = coords_xyz[..., ::-1].copy()          # zyx
    num_points = rng.integers(1, p + 1, size=(batch_size, m)).astype(np.int32)
    vvalid = np.zeros((batch_size, m), bool)
    vvalid[:, :mv] = True
    coords[~vvalid] = -1

    # dedupe voxel coords per item (the voxelizer guarantees uniqueness)
    for b in range(batch_size):
        keys = ((coords[b, :, 0].astype(np.int64) * (ny) + coords[b, :, 1])
                * nx + coords[b, :, 2])
        keys[~vvalid[b]] = -1 - np.arange((~vvalid[b]).sum())
        _, first = np.unique(keys, return_index=True)
        dup = np.ones(m, bool)
        dup[first] = False
        vvalid[b, dup & vvalid[b]] = False
        coords[b, ~vvalid[b]] = -1

    # compact valid voxels to the front (rulebook builder expects that)
    for b in range(batch_size):
        order = np.argsort(~vvalid[b], kind="stable")
        coords[b] = coords[b][order]
        pts[b] = pts[b][order]
        num_points[b] = num_points[b][order]
        vvalid[b] = vvalid[b][order]

    from ..data.rulebook import build_rulebook
    spatial_shape = (nz + 1, ny, nx)
    caps = cfg.model.lidar.max_voxels_per_stage
    rbs = [build_rulebook(coords[b], int(vvalid[b].sum()), spatial_shape,
                          caps) for b in range(batch_size)]
    rulebook = {k: jnp.asarray(np.stack([rb[k] for rb in rbs]))
                for k in rbs[0]}

    return Batch(
        images=jnp.asarray(images), boxes2d=jnp.asarray(boxes2d),
        boxes3d=jnp.asarray(boxes3d), person_valid=jnp.asarray(valid),
        social_group_id=jnp.asarray(sgid), actions=jnp.asarray(actions),
        social_group_activity=jnp.asarray(activity),
        voxels=jnp.asarray(pts), voxel_coords=jnp.asarray(coords),
        voxel_num_points=jnp.asarray(num_points),
        voxel_valid=jnp.asarray(vvalid),
        seq_id=jnp.zeros((batch_size,), jnp.int32),
        frame_id=jnp.zeros((batch_size,), jnp.int32),
        rulebook=rulebook,
    )
