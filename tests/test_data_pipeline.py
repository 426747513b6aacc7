"""Data pipeline tests: voxelizer semantics, PCD IO, synthetic JRDB end-to-end."""
import dataclasses
import os

import numpy as np
import pytest

from multimodal_gar_tpu.config import (DataConfig, PointCloudConfig,
                                       VoxelizationConfig)
from multimodal_gar_tpu.data.jrdb import JRDBActDataset, collate
from multimodal_gar_tpu.data.pipeline import DataPipeline
from multimodal_gar_tpu.data.pointcloud import load_pcd, sample_points
from multimodal_gar_tpu.data.synthetic import _write_pcd, write_synthetic_jrdb
from multimodal_gar_tpu.data.voxelizer import Voxelizer


def test_voxelizer_first_come_order_and_caps():
    vox = Voxelizer(voxel_size=(1.0, 1.0, 1.0),
                    point_cloud_range=(0, 0, 0, 4, 4, 4),
                    max_points_per_voxel=2, max_voxels=3)
    pts = np.array([
        [0.5, 0.5, 0.5, 1.0],   # voxel A (first)
        [1.5, 0.5, 0.5, 2.0],   # voxel B
        [0.6, 0.6, 0.6, 3.0],   # voxel A again
        [0.7, 0.7, 0.7, 4.0],   # voxel A third point -> dropped (cap 2)
        [2.5, 2.5, 2.5, 5.0],   # voxel C
        [3.5, 3.5, 3.5, 6.0],   # voxel D -> dropped (max_voxels 3)
        [9.0, 0.5, 0.5, 7.0],   # out of range
    ], np.float32)
    out = vox(pts)
    assert out.voxels.shape[0] == 3
    np.testing.assert_array_equal(out.num_points, [2, 1, 1])
    # appearance order: A, B, C; coords are zyx
    np.testing.assert_array_equal(out.coords, [[0, 0, 0], [0, 0, 1], [2, 2, 2]])
    # voxel A keeps its first two points in input order
    np.testing.assert_allclose(out.voxels[0, :, 3], [1.0, 3.0])
    np.testing.assert_allclose(out.voxels[1, 0, 3], 2.0)


def test_voxelizer_handles_empty():
    vox = Voxelizer((1, 1, 1), (0, 0, 0, 2, 2, 2), 2, 4)
    out = vox(np.zeros((0, 4), np.float32))
    assert out.voxels.shape[0] == 0


def test_pcd_binary_roundtrip(tmp_path):
    pts = np.random.default_rng(0).uniform(-1, 1, (50, 4)).astype(np.float32)
    path = str(tmp_path / "x.pcd")
    _write_pcd(path, pts)
    loaded = load_pcd(path)
    np.testing.assert_allclose(loaded, pts, rtol=1e-6)


def test_sample_points_up_and_down():
    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    up = sample_points(pts, 16)
    dn = sample_points(pts, 4)
    assert up.shape == (16, 3) and dn.shape == (4, 3)


@pytest.fixture(scope="module")
def mini_jrdb(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("jrdb"))
    write_synthetic_jrdb(root, num_seqs=2, frames_per_seq=4,
                         people_per_frame=5, image_hw=(60, 100))
    return root


def _data_cfg(root):
    pc = PointCloudConfig(
        num_points=128, range=(-6.0, -6.0, -2.0, 6.0, 6.0, 3.0),
        voxel=VoxelizationConfig((0.5, 0.5, 0.625), 5, 256, 256))
    return DataConfig(root=root, image_size=(60, 100), num_frames=3,
                      num_boxes=8, point_cloud=pc)


def test_dataset_sample_shapes(mini_jrdb):
    ds = JRDBActDataset(_data_cfg(mini_jrdb), split="train")
    assert len(ds) == 8
    s = ds[0]
    assert s["images"].shape == (3, 60, 100, 3)
    assert s["boxes2d"].shape == (8, 4)
    assert s["person_valid"].sum() == 5
    assert s["voxel_valid"].any()
    # 2d boxes scaled to pixels, xyxy
    b = s["boxes2d"][s["person_valid"]]
    assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()
    assert b[:, 2].max() <= 100 and b[:, 3].max() <= 60


def test_pipeline_batches_and_sharding(mini_jrdb):
    ds = JRDBActDataset(_data_cfg(mini_jrdb), split="train")
    pipe = DataPipeline(ds, batch_size=2, shuffle=True, prefetch=1)
    batches = list(pipe.epoch(0))
    assert len(batches) == 4
    assert batches[0].images.shape == (2, 3, 60, 100, 3)
    # deterministic per-epoch order
    again = list(pipe.epoch(0))
    np.testing.assert_array_equal(np.asarray(batches[0].seq_id),
                                  np.asarray(again[0].seq_id))
    # sharding partitions the batches
    s0 = list(DataPipeline(ds, 2, shard_index=0, shard_count=2,
                           prefetch=0).epoch(0))
    s1 = list(DataPipeline(ds, 2, shard_index=1, shard_count=2,
                           prefetch=0).epoch(0))
    assert len(s0) == 2 and len(s1) == 2


def test_remainder_batch_padded_to_fixed_shape(mini_jrdb):
    """drop_last=False: the remainder batch is padded to batch_size with
    all-invalid rows — one compiled shape per run (VERDICT item 10)."""
    ds = JRDBActDataset(_data_cfg(mini_jrdb), split="train")
    assert len(ds) == 8
    pipe = DataPipeline(ds, batch_size=3, shuffle=False, drop_last=False,
                        prefetch=0)
    batches = list(pipe.epoch(0))
    assert len(batches) == 3
    for b in batches:
        assert b.images.shape[0] == 3
    last = batches[-1]
    pv = np.asarray(last.person_valid)
    assert pv[0].any() and pv[1].any()   # the 2 real samples (8 = 3+3+2)
    assert not pv[2:].any()              # padded duplicate is all-invalid


def test_process_decode_pool_matches_serial(mini_jrdb):
    """num_workers>0 (process decode, reference train_func.py:506) yields
    byte-identical batches in the same order as the serial path."""
    import jax
    ds = JRDBActDataset(_data_cfg(mini_jrdb), split="train")
    serial = list(DataPipeline(ds, batch_size=2, shuffle=True,
                               prefetch=0).epoch(1))
    pooled_pipe = DataPipeline(ds, batch_size=2, shuffle=True, prefetch=1,
                               num_workers=2)
    try:
        pooled = list(pooled_pipe.epoch(1))
        assert len(pooled) == len(serial)
        for a, b in zip(serial, pooled):
            la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
            assert len(la) == len(lb)
            for x, y in zip(la, lb):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        # early abandonment must not deadlock the pool or the next epoch
        it = pooled_pipe.epoch(2)
        next(it)
        it.close()
        assert len(list(pooled_pipe.epoch(3))) == len(serial)
    finally:
        pooled_pipe.close()


def test_decode_pool_imap_order_and_errors(mini_jrdb):
    from multimodal_gar_tpu.data.decode_pool import ProcessDecodePool
    ds = JRDBActDataset(_data_cfg(mini_jrdb), split="train")
    with ProcessDecodePool(ds, num_workers=2) as pool:
        idx = [3, 0, 5, 1, 1, 7]
        got = list(pool.imap(idx))
        for i, s in zip(idx, got):
            ref = ds[i]
            np.testing.assert_array_equal(s["images"], ref["images"])
            np.testing.assert_array_equal(s["voxels"], ref["voxels"])
        # a worker exception surfaces in the parent, pool still usable shape-wise
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="decode worker failed"):
            list(pool.imap([9999]))


def test_pipeline_eig_precompute(mini_jrdb):
    """with_eig=True attaches e_hat/e_count identical to the host helper."""
    from multimodal_gar_tpu.train.losses import prepare_eig_inputs
    ds = JRDBActDataset(_data_cfg(mini_jrdb), split="train")
    pipe = DataPipeline(ds, batch_size=2, shuffle=False, prefetch=1,
                        with_eig=True)
    batch = next(iter(pipe.epoch(0)))
    assert batch.e_hat is not None and batch.e_count is not None
    e_hat, e_count = prepare_eig_inputs(
        np.asarray(batch.social_group_id), np.asarray(batch.person_valid))
    np.testing.assert_allclose(np.asarray(batch.e_hat), e_hat, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(batch.e_count), e_count)


def test_batch_feeds_model(mini_jrdb):
    """Synthetic on-disk dataset -> pipeline -> full MGAR forward."""
    import jax
    from functools import partial

    from multimodal_gar_tpu.config import Config, PoolLayerConfig
    from multimodal_gar_tpu.models import MGAR

    dcfg = _data_cfg(mini_jrdb)
    ds = JRDBActDataset(dcfg, split="train")
    batch = collate([ds[0]])

    cfg = Config()
    cfg = dataclasses.replace(cfg, data=dcfg)
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, lidar=dataclasses.replace(
            cfg.model.lidar, max_voxels_per_stage=(256, 256, 128, 64),
            grid_pool_size=3,
            pool_layers=(PoolLayerConfig("x_conv2", (8, 8), (2, 2, 2), 1.0, 4),
                         PoolLayerConfig("x_conv3", (8, 8), (2, 2, 2), 2.0, 4),
                         PoolLayerConfig("x_conv4", (8, 8), (2, 2, 2), 4.0, 4)))))
    model = MGAR(cfg)
    v = jax.jit(partial(model.init, train=False))(jax.random.PRNGKey(0), batch)
    out = jax.jit(partial(model.apply, train=False))(v, batch)
    assert np.isfinite(np.asarray(out.a_theta)).all()


def test_processor_chain():
    from multimodal_gar_tpu.data.processor import (ProcessorChain,
                                                   double_flip,
                                                   mask_boxes_outside_range)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-200, 200, (500, 4)).astype(np.float32)
    chain = ProcessorChain(
        [{"NAME": "mask_points_and_boxes_outside_range"},
         {"NAME": "shuffle_points", "SHUFFLE_ENABLED": {"train": True}},
         {"NAME": "sample_points", "NUM_POINTS": 128}],
        point_cloud_range=(-100, -100, -25, 100, 100, 25), training=True)
    out = chain(pts)
    assert out.shape == (128, 4)
    assert (np.abs(out[:, 0]) <= 100).all() and (np.abs(out[:, 1]) <= 100).all()

    yf, xf, xyf = double_flip(pts)
    np.testing.assert_allclose(yf[:, 1], -pts[:, 1])
    np.testing.assert_allclose(xyf[:, 0], -pts[:, 0])

    boxes = np.array([[0, 0, 0, 2, 2, 2, 0.0], [500, 0, 0, 2, 2, 2, 0.0]],
                     np.float32)
    keep = mask_boxes_outside_range(boxes, (-100, -100, -25, 100, 100, 25))
    np.testing.assert_array_equal(keep, [True, False])


def test_world_augmentor_consistency():
    """Augmented points must stay consistent with augmented boxes: a point at
    a box center must remain at the (augmented) box center."""
    from multimodal_gar_tpu.data.augmentor import WorldAugmentor
    rng = np.random.default_rng(0)
    boxes = np.zeros((3, 7), np.float32)
    boxes[:, :3] = rng.uniform(-5, 5, (3, 3))
    boxes[:, 3:6] = 1.0
    points = boxes[:, :3].copy()
    aug = WorldAugmentor([
        {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x", "y"]},
        {"NAME": "random_world_rotation", "WORLD_ROT_ANGLE": [-0.5, 0.5]},
        {"NAME": "random_world_scaling", "WORLD_SCALE_RANGE": [0.9, 1.1]},
    ], seed=3)
    p2, b2 = aug(points, boxes)
    np.testing.assert_allclose(p2, b2[:, :3], atol=1e-5)
    # scaling preserved box aspect, rotation kept extents positive
    assert (b2[:, 3:6] > 0).all()


def test_world_flip_yaw_semantics():
    from multimodal_gar_tpu.data.augmentor import random_world_flip

    class AlwaysFlip:
        def integers(self, a, b):
            return 0 if False else 1  # always flip
    boxes = np.asarray([[1.0, 2.0, 0, 1, 1, 1, 0.3]], np.float32)
    # a point ahead of the box along its heading must stay ahead after flip
    head = boxes[0, :3] + [np.cos(0.3), np.sin(0.3), 0]
    pts = np.vstack([boxes[0, :3], head]).astype(np.float32)
    p2, b2 = random_world_flip(pts, boxes, ["x"], AlwaysFlip())
    expect_head = b2[0, :3] + [np.cos(b2[0, 6]), np.sin(b2[0, 6]), 0]
    np.testing.assert_allclose(p2[1], expect_head, atol=1e-6)


def test_downsample_depth_map_block_mean():
    import numpy as np
    from multimodal_gar_tpu.data.processor import downsample_depth_map
    d = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = downsample_depth_map(d, 2)
    assert out.shape == (2, 2)
    np.testing.assert_allclose(out, [[2.5, 4.5], [10.5, 12.5]])
    # non-divisible edge: zero-padded mean (downscale_local_mean cval=0)
    d2 = np.ones((3, 3), np.float32)
    out2 = downsample_depth_map(d2, 2)
    assert out2.shape == (2, 2)
    np.testing.assert_allclose(out2, [[1.0, 0.5], [0.5, 0.25]])
