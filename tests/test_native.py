"""Native C++ voxelizer: build, equivalence with numpy reference, speed."""
import time

import numpy as np
import pytest

from multimodal_gar_tpu.data.voxelizer import Voxelizer
from multimodal_gar_tpu.native import load_native, native_voxelize

native_available = load_native() is not None
pytestmark = pytest.mark.skipif(not native_available,
                                reason="native lib not built")


def _random_points(n=35000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform([-90, -90, -20, 0], [90, 90, 20, 1],
                       (n, 4)).astype(np.float32)


def test_native_matches_numpy():
    pts = _random_points(20000)
    kwargs = dict(voxel_size=(0.5, 0.5, 2.0),
                  point_cloud_range=(-100, -100, -25, 100, 100, 25),
                  max_points_per_voxel=5, max_voxels=16000)
    ref = Voxelizer(use_native=False, **kwargs)(pts)
    nat = Voxelizer(use_native=True, **kwargs)(pts)
    assert nat.voxels.shape[0] == ref.voxels.shape[0]
    np.testing.assert_array_equal(nat.coords, ref.coords)
    np.testing.assert_array_equal(nat.num_points, ref.num_points)
    np.testing.assert_allclose(nat.voxels, ref.voxels)


def test_native_respects_caps():
    pts = _random_points(5000)
    out = Voxelizer(voxel_size=(10.0, 10.0, 10.0),
                    point_cloud_range=(-100, -100, -25, 100, 100, 25),
                    max_points_per_voxel=3, max_voxels=8)(pts)
    assert out.voxels.shape[0] <= 8
    assert out.num_points.max() <= 3


def test_native_transform_points():
    lib = load_native()
    pts = _random_points(100)
    orig = pts.copy()
    tr = np.asarray([1.0, 2.0, 3.0], np.float32)
    lib.mgar_transform_points(pts, 100, 4, np.float32(np.pi / 2), tr)
    # 90deg yaw: (x, y) -> (-y, x), + translation
    np.testing.assert_allclose(pts[:, 0], -orig[:, 1] + 1.0, atol=1e-4)
    np.testing.assert_allclose(pts[:, 1], orig[:, 0] + 2.0, atol=1e-4)
    np.testing.assert_allclose(pts[:, 2], orig[:, 2] + 3.0, atol=1e-5)
    np.testing.assert_allclose(pts[:, 3], orig[:, 3])


def test_native_faster_than_numpy():
    pts = _random_points(35000)
    kwargs = dict(voxel_size=(0.1, 0.1, 1.25),
                  point_cloud_range=(-100, -100, -25, 100, 100, 25),
                  max_points_per_voxel=5, max_voxels=16000)
    vn = Voxelizer(use_native=False, **kwargs)
    vc = Voxelizer(use_native=True, **kwargs)
    vn(pts); vc(pts)  # warm
    t0 = time.perf_counter(); [vn(pts) for _ in range(3)]
    t_np = time.perf_counter() - t0
    t0 = time.perf_counter(); [vc(pts) for _ in range(3)]
    t_cc = time.perf_counter() - t0
    print(f"numpy {t_np/3*1e3:.1f}ms  native {t_cc/3*1e3:.1f}ms")
    assert t_cc < t_np


def test_native_rulebook_matches_numpy(rng):
    import multimodal_gar_tpu.data.rulebook as rbmod
    from multimodal_gar_tpu.native import native_rulebook

    shape = (9, 64, 64)
    m, nv = 400, 300
    coords = np.stack([rng.integers(0, s, m) for s in shape], -1).astype(np.int32)
    keys = (coords[:, 0].astype(np.int64) * shape[1] + coords[:, 1]) \
        * shape[2] + coords[:, 2]
    _, first = np.unique(keys, return_index=True)
    coords = coords[np.sort(first)][:nv]
    nv = len(coords)
    coords = np.concatenate([coords, np.full((m - nv, 3), -1, np.int32)])
    caps = (m, m, m // 2, m // 4)

    native = native_rulebook(coords, nv, shape, caps)
    assert native is not None
    # numpy reference: call the pure-numpy internals directly (bypassing
    # build_rulebook's native dispatch)
    ref = {}
    cur_coords, cur_valid, cur_shape = coords[:caps[0]], nv, shape
    for k in range(4):
        cap = caps[k]
        if k > 0:
            new_coords, new_valid, down, new_shape = rbmod._downsample(
                cur_coords, cur_valid, cur_shape, rbmod.STAGE_STRIDES[k],
                rbmod.STAGE_PADDINGS[k], cap)
            ref[f"down_{k}"] = down
            cur_coords, cur_valid, cur_shape = new_coords, new_valid, new_shape
            ref[f"coords_{k}"] = cur_coords
            ref[f"count_{k}"] = np.int32(cur_valid)
        ref[f"nbr_{k}"] = rbmod._subm_neighbors(cur_coords, cur_valid,
                                                cur_shape, cap)

    for key in ref:
        np.testing.assert_array_equal(native[key], ref[key], err_msg=key)


def test_native_rulebook_speed(rng):
    import time
    from multimodal_gar_tpu.native import native_rulebook
    shape = (41, 2000, 2000)
    m = 16000
    coords = np.stack([rng.integers(0, s, m) for s in shape], -1).astype(np.int32)
    keys = (coords[:, 0].astype(np.int64) * shape[1] + coords[:, 1]) \
        * shape[2] + coords[:, 2]
    _, first = np.unique(keys, return_index=True)
    coords = coords[np.sort(first)]
    nv = len(coords)
    coords = np.concatenate([coords, np.full((m - nv, 3), -1, np.int32)])
    caps = (16000, 16000, 8000, 4000)
    native_rulebook(coords, nv, shape, caps)  # warm
    t0 = time.perf_counter()
    native_rulebook(coords, nv, shape, caps)
    dt = time.perf_counter() - t0
    print(f"native rulebook @16k voxels: {dt*1e3:.1f} ms")
    assert dt < 0.5
