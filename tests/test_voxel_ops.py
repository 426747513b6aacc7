"""Voxel index machinery: lookup correctness, query fast-path == scan-path."""
import jax.numpy as jnp
import numpy as np

from multimodal_gar_tpu.ops import voxel as vox


def _random_voxel_set(rng, m, shape, n_valid):
    coords = np.stack([rng.integers(0, s, m) for s in shape], -1).astype(np.int32)
    # dedupe coords (voxelizer guarantees uniqueness)
    keys = (coords[:, 0] * shape[1] + coords[:, 1]) * shape[2] + coords[:, 2]
    _, uniq_idx = np.unique(keys, return_index=True)
    coords = coords[np.sort(uniq_idx)][:n_valid]
    pad = m - len(coords)
    coords = np.concatenate([coords, np.full((pad, 3), -1, np.int32)])
    valid = np.arange(m) < (m - pad)
    return jnp.asarray(coords), jnp.asarray(valid)


def test_lookup_roundtrip(rng):
    shape = (8, 16, 16)
    coords, valid = _random_voxel_set(rng, 64, shape, 50)
    table = vox.build_lookup(coords, valid, shape)
    idx = vox.lookup(table, coords, valid, shape)
    n_valid = int(valid.sum())
    np.testing.assert_array_equal(np.asarray(idx[:n_valid]),
                                  np.arange(n_valid))
    # absent coords -> -1
    absent = jnp.asarray([[7, 15, 15]], jnp.int32)
    if not any((np.asarray(coords[:n_valid]) == [7, 15, 15]).all(1)):
        assert int(vox.lookup(table, absent, jnp.asarray([True]), shape)[0]) == -1
    # out-of-range -> -1
    oob = jnp.asarray([[-1, 0, 0], [8, 0, 0]], jnp.int32)
    out = vox.lookup(table, oob, jnp.asarray([True, True]), shape)
    np.testing.assert_array_equal(np.asarray(out), [-1, -1])


def test_voxel_query_fast_matches_scan(rng):
    shape = (10, 20, 20)
    m = 128
    coords, valid = _random_voxel_set(rng, m, shape, 100)
    voxel_size = (0.5, 0.5, 0.5)
    pc_range = (-5.0, -5.0, -2.5, 5.0, 5.0, 2.5)
    centers = vox.get_voxel_centers(coords, 1, voxel_size, pc_range)
    table = vox.build_lookup(coords, valid, shape)

    r = 40
    q_xyz = jnp.asarray(rng.uniform(-4, 4, (r, 3)).astype(np.float32))
    pc_min = jnp.asarray(pc_range[:3])
    q_grid = jnp.floor((q_xyz - pc_min) / jnp.asarray(voxel_size)).astype(jnp.int32)
    q_zyx = q_grid[:, ::-1]
    q_valid = jnp.asarray(rng.uniform(size=r) < 0.9)

    args = (centers, q_xyz, q_zyx, q_valid, shape, (2, 2, 2), 1.2, 8)
    idx_scan, empty_scan = vox.voxel_query_scan(table, *args)
    idx_fast, empty_fast = vox.voxel_query(
        table, *args, voxel_coords=coords, voxel_valid=valid, query_chunk=16,
        exact=True)

    np.testing.assert_array_equal(np.asarray(empty_scan), np.asarray(empty_fast))
    np.testing.assert_array_equal(np.asarray(idx_scan), np.asarray(idx_fast))


def test_voxel_query_empty_ball(rng):
    shape = (4, 8, 8)
    coords = jnp.asarray([[0, 0, 0]], jnp.int32)
    valid = jnp.asarray([True])
    centers = vox.get_voxel_centers(coords, 1, (1, 1, 1), (0, 0, 0, 8, 8, 4))
    q_xyz = jnp.asarray([[7.5, 7.5, 3.5]])
    q_zyx = jnp.asarray([[3, 7, 7]], jnp.int32)
    idx, empty = vox.voxel_query(
        None, centers, q_xyz, q_zyx, jnp.asarray([True]), shape,
        (1, 1, 1), 1.0, 4, voxel_coords=coords, voxel_valid=valid)
    assert bool(empty[0])
    np.testing.assert_array_equal(np.asarray(idx[0]), 0)


def test_voxel_query_boxed_matches_dense(rng):
    """Per-box culled query == dense fast path when cull_k covers every
    in-reach voxel (here cull_k == M, unconditionally exact)."""
    shape = (10, 20, 20)
    m = 128
    coords, valid = _random_voxel_set(rng, m, shape, 100)
    voxel_size = (0.5, 0.5, 0.5)
    pc_range = (-5.0, -5.0, -2.5, 5.0, 5.0, 2.5)
    centers = vox.get_voxel_centers(coords, 1, voxel_size, pc_range)

    n_boxes, g3 = 5, 8
    box_centers = rng.uniform(-3, 3, (n_boxes, 3)).astype(np.float32)
    offsets = rng.uniform(-0.6, 0.6, (n_boxes, g3, 3)).astype(np.float32)
    q_xyz = jnp.asarray(box_centers[:, None, :] + offsets)
    pc_min = jnp.asarray(pc_range[:3])
    q_grid = jnp.floor((q_xyz.reshape(-1, 3) - pc_min)
                       / jnp.asarray(voxel_size)).astype(jnp.int32)
    q_zyx = q_grid[:, ::-1]
    q_valid = jnp.asarray(rng.uniform(size=n_boxes * g3) < 0.9)

    idx_dense, empty_dense = vox.voxel_query(
        None, centers, q_xyz.reshape(-1, 3), q_zyx, q_valid, shape,
        (2, 2, 2), 1.2, 8, voxel_coords=coords, voxel_valid=valid,
        query_chunk=16, exact=True)
    idx_boxed, empty_boxed = vox.voxel_query_boxed(
        centers, coords, valid, q_xyz,
        q_zyx.reshape(n_boxes, g3, 3), q_valid.reshape(n_boxes, g3),
        (2, 2, 2), 1.2, 8, cull_k=m)
    np.testing.assert_array_equal(np.asarray(empty_dense),
                                  np.asarray(empty_boxed))
    np.testing.assert_array_equal(np.asarray(idx_dense),
                                  np.asarray(idx_boxed))


def test_voxel_query_boxed_small_cull(rng):
    """With a tight but sufficient cull (all active voxels near the box),
    a small cull_k still reproduces the dense result."""
    shape = (10, 20, 20)
    voxel_size = (0.5, 0.5, 0.5)
    pc_range = (-5.0, -5.0, -2.5, 5.0, 5.0, 2.5)
    # 30 voxels clustered near the origin + 60 far away
    near = np.stack([rng.integers(4, 6, 30), rng.integers(8, 12, 30),
                     rng.integers(8, 12, 30)], -1)
    far = np.stack([rng.integers(0, 2, 60), rng.integers(16, 20, 60),
                    rng.integers(16, 20, 60)], -1)
    coords = np.concatenate([near, far]).astype(np.int32)
    keys = (coords[:, 0] * shape[1] + coords[:, 1]) * shape[2] + coords[:, 2]
    _, uniq = np.unique(keys, return_index=True)
    coords = coords[np.sort(uniq)]
    m = len(coords)
    coords = jnp.asarray(coords)
    valid = jnp.ones(m, bool)
    centers = vox.get_voxel_centers(coords, 1, voxel_size, pc_range)

    g3 = 8
    q_xyz = jnp.asarray(rng.uniform(-0.8, 0.8, (1, g3, 3)).astype(np.float32))
    pc_min = jnp.asarray(pc_range[:3])
    q_grid = jnp.floor((q_xyz.reshape(-1, 3) - pc_min)
                       / jnp.asarray(voxel_size)).astype(jnp.int32)
    q_zyx = q_grid[:, ::-1]
    q_valid = jnp.ones(g3, bool)

    idx_dense, empty_dense = vox.voxel_query(
        None, centers, q_xyz.reshape(-1, 3), q_zyx, q_valid, shape,
        (2, 2, 2), 1.2, 8, voxel_coords=coords, voxel_valid=valid,
        query_chunk=8, exact=True)
    idx_boxed, empty_boxed = vox.voxel_query_boxed(
        centers, coords, valid, q_xyz, q_zyx.reshape(1, g3, 3),
        q_valid.reshape(1, g3), (2, 2, 2), 1.2, 8, cull_k=32)
    np.testing.assert_array_equal(np.asarray(empty_dense),
                                  np.asarray(empty_boxed))
    np.testing.assert_array_equal(np.asarray(idx_dense),
                                  np.asarray(idx_boxed))


def test_roi_grid_pool_cull_matches_dense(rng):
    """ROIGridPool forward with the per-box cull == the dense query path
    (same params, same inputs)."""
    import dataclasses

    import jax
    from multimodal_gar_tpu.config import (LiDARBackboneConfig,
                                           PointCloudConfig,
                                           PoolLayerConfig,
                                           VoxelizationConfig)
    from multimodal_gar_tpu.models.roi_grid_pool import ROIGridPool
    from multimodal_gar_tpu.models.sparse_backbone import (BACKBONE_STRIDES,
                                                           SparseTensor)

    pc = PointCloudConfig(
        num_points=512, range=(-8.0, -8.0, -2.5, 8.0, 8.0, 2.5),
        voxel=VoxelizationConfig((0.25, 0.25, 0.625), 5, 256, 256))
    lidar = LiDARBackboneConfig(
        grid_pool_size=3,
        pool_layers=(
            PoolLayerConfig("x_conv2", (8, 8), (2, 2, 2), 0.6, 8),
            PoolLayerConfig("x_conv3", (8, 8), (2, 2, 2), 1.2, 8)),
        max_voxels_per_stage=(256, 128, 64, 32),
        # exact selection on both paths: this test asserts cull == dense
        # bitwise; approx_max_k (the perf default) is only ~0.99 recall
        pool_approx_nsample=False)
    nx, ny, nz = pc.grid_size

    ms = {}
    for name, m, c in (("x_conv2", 128, 8), ("x_conv3", 64, 8)):
        stride = BACKBONE_STRIDES[name]
        shape = (nz // stride + 1, ny // stride, nx // stride)
        coords, valid = _random_voxel_set(rng, m, shape, m - 10)
        ms[name] = SparseTensor(
            features=jnp.asarray(
                rng.normal(size=(1, m, c)).astype(np.float32)),
            coords=coords[None], valid=valid[None], spatial_shape=shape)

    rois = np.zeros((1, 4, 7), np.float32)
    rois[0, :, :3] = rng.uniform(-4, 4, (4, 3))
    rois[0, :, 3:6] = rng.uniform(0.8, 2.0, (4, 3))
    rois[0, :, 6] = rng.uniform(-np.pi, np.pi, 4)
    roi_valid = jnp.asarray([[True, True, True, False]])
    rois = jnp.asarray(rois)

    outs = {}
    for cull_k in (0, 128):
        cfg = dataclasses.replace(lidar, pool_cull_k=cull_k)
        pool = ROIGridPool(cfg, pc)
        variables = pool.init(jax.random.PRNGKey(0), ms, rois, roi_valid)
        pooled, _ = pool.apply(variables, ms, rois, roi_valid, train=False)
        outs[cull_k] = np.asarray(pooled)
    np.testing.assert_allclose(outs[0], outs[128], atol=1e-5)


def test_roi_grid_pool_batch_independent(rng):
    """Eval-path pool at B=2 == the two B=1 runs stacked.

    Guards the batch-unrolled gather in NeighborVoxelPoolLayer (vmap's
    batched row-gather is super-linear on TPU; the unroll replaces it with
    B per-item gathers — this asserts the unroll is exact per item)."""
    import jax
    from multimodal_gar_tpu.config import (LiDARBackboneConfig,
                                           PointCloudConfig,
                                           PoolLayerConfig,
                                           VoxelizationConfig)
    from multimodal_gar_tpu.models.roi_grid_pool import ROIGridPool
    from multimodal_gar_tpu.models.sparse_backbone import (BACKBONE_STRIDES,
                                                           SparseTensor)

    pc = PointCloudConfig(
        num_points=512, range=(-8.0, -8.0, -2.5, 8.0, 8.0, 2.5),
        voxel=VoxelizationConfig((0.25, 0.25, 0.625), 5, 256, 256))
    lidar = LiDARBackboneConfig(
        grid_pool_size=3,
        pool_layers=(
            PoolLayerConfig("x_conv2", (8, 8), (2, 2, 2), 0.6, 8),
            PoolLayerConfig("x_conv3", (8, 8), (2, 2, 2), 1.2, 8)),
        max_voxels_per_stage=(256, 128, 64, 32))
    nx, ny, nz = pc.grid_size

    ms2, ms1 = {}, [{}, {}]
    for name, m, c in (("x_conv2", 128, 8), ("x_conv3", 64, 8)):
        stride = BACKBONE_STRIDES[name]
        shape = (nz // stride + 1, ny // stride, nx // stride)
        cs, vs, fs = [], [], []
        for _ in range(2):
            coords, valid = _random_voxel_set(rng, m, shape, m - 10)
            cs.append(coords); vs.append(valid)
            fs.append(rng.normal(size=(m, c)).astype(np.float32))
        ms2[name] = SparseTensor(
            features=jnp.stack([jnp.asarray(f) for f in fs]),
            coords=jnp.stack(cs), valid=jnp.stack(vs), spatial_shape=shape)
        for b in range(2):
            ms1[b][name] = SparseTensor(
                features=jnp.asarray(fs[b])[None], coords=cs[b][None],
                valid=vs[b][None], spatial_shape=shape)

    rois = np.zeros((2, 4, 7), np.float32)
    rois[:, :, :3] = rng.uniform(-4, 4, (2, 4, 3))
    rois[:, :, 3:6] = rng.uniform(0.8, 2.0, (2, 4, 3))
    rois[:, :, 6] = rng.uniform(-np.pi, np.pi, (2, 4))
    roi_valid = jnp.asarray([[True, True, True, False],
                             [True, True, False, False]])
    rois = jnp.asarray(rois)

    pool = ROIGridPool(lidar, pc)
    variables = pool.init(jax.random.PRNGKey(0), ms2, rois, roi_valid)
    pooled2, _ = pool.apply(variables, ms2, rois, roi_valid, train=False)
    for b in range(2):
        pooled1, _ = pool.apply(variables, ms1[b], rois[b:b + 1],
                                roi_valid[b:b + 1], train=False)
        np.testing.assert_allclose(np.asarray(pooled2)[b],
                                   np.asarray(pooled1)[0], atol=1e-5)
