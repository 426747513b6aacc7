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
