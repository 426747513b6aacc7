"""Golden tests for sampling / neighbor / rotated-box ops."""
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_gar_tpu.ops.boxes3d import (boxes_iou3d, boxes_iou_bev,
                                            boxes_overlap_bev,
                                            boxes_to_corners_3d, nms_bev,
                                            points_in_boxes, roiaware_pool3d,
                                            roipoint_pool3d)
from multimodal_gar_tpu.ops.neighbor import (ball_query, grouping_operation,
                                             three_interpolate, three_nn)
from multimodal_gar_tpu.ops.sampling import farthest_point_sampling


# --- sampling --------------------------------------------------------------

def test_fps_spreads_points():
    # 4 corners of a square + cluster at one corner: FPS must pick the corners
    pts = jnp.asarray([[0, 0, 0], [0.1, 0, 0], [0.05, 0.05, 0],
                       [10, 0, 0], [0, 10, 0], [10, 10, 0]], jnp.float32)
    idx = np.asarray(farthest_point_sampling(pts, 4))
    assert set(idx) >= {3, 4, 5}          # far corners all selected
    assert idx[0] == 0


def test_fps_respects_mask():
    pts = jnp.asarray([[0, 0, 0], [100, 0, 0], [0, 1, 0]], jnp.float32)
    valid = jnp.asarray([True, False, True])
    idx = np.asarray(farthest_point_sampling(pts, 2, valid))
    assert 1 not in idx


# --- neighbor --------------------------------------------------------------

def test_ball_query_first_hits_and_padding():
    xyz = jnp.asarray([[0, 0, 0], [0.1, 0, 0], [5, 5, 5], [0.2, 0, 0]],
                      jnp.float32)
    q = jnp.asarray([[0, 0, 0.0], [9, 9, 9]], jnp.float32)
    idx, empty = ball_query(1.0, 3, xyz, q)
    np.testing.assert_array_equal(np.asarray(idx[0]), [0, 1, 3])
    assert not bool(empty[0]) and bool(empty[1])


def test_three_nn_and_interpolate_exact_at_known_point():
    known = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], jnp.float32)
    feats = jnp.asarray([[1.0], [2.0], [3.0]])
    dist, idx = three_nn(jnp.asarray([[0, 0, 0.0]]), known)
    assert int(idx[0, 0]) == 0
    out = three_interpolate(feats, idx, dist)
    # at distance 0, the 1/d^2 weight saturates to the nearest point's value
    assert abs(float(out[0, 0]) - 1.0) < 1e-4


def test_grouping_operation():
    feats = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
    idx = jnp.asarray([[0, 2], [3, 3]], jnp.int32)
    out = np.asarray(grouping_operation(feats, idx))
    np.testing.assert_allclose(out[0, 1], [6, 7, 8])


# --- rotated boxes ---------------------------------------------------------

def _box(cx, cy, cz, dx, dy, dz, yaw):
    return [cx, cy, cz, dx, dy, dz, yaw]


def test_corners_unit_box():
    c = np.asarray(boxes_to_corners_3d(jnp.asarray([_box(0, 0, 0, 2, 2, 2, 0.0)])))
    assert c.shape == (1, 8, 3)
    assert np.allclose(np.abs(c), 1.0)


def test_bev_overlap_axis_aligned():
    a = jnp.asarray([_box(0, 0, 0, 2, 2, 2, 0.0)])
    b = jnp.asarray([_box(1, 1, 0, 2, 2, 2, 0.0)])
    inter = float(boxes_overlap_bev(a, b)[0, 0])
    assert abs(inter - 1.0) < 1e-5        # 1x1 overlap
    iou = float(boxes_iou_bev(a, b)[0, 0])
    assert abs(iou - 1.0 / 7.0) < 1e-5


def test_bev_overlap_rotated_45():
    # unit square vs itself rotated 45deg: intersection is a regular octagon
    # with area 8*(sqrt(2)-1) for side sqrt(2)... for unit squares: 2*(sqrt2-1)
    a = jnp.asarray([_box(0, 0, 0, 1, 1, 1, 0.0)])
    b = jnp.asarray([_box(0, 0, 0, 1, 1, 1, np.pi / 4)])
    inter = float(boxes_overlap_bev(a, b)[0, 0])
    expect = 2 * (np.sqrt(2) - 1)
    assert abs(inter - expect) < 1e-4


def test_iou3d_identical_boxes():
    a = jnp.asarray([_box(1, 2, 3, 2, 3, 4, 0.7)])
    assert abs(float(boxes_iou3d(a, a)[0, 0]) - 1.0) < 1e-5


def test_iou3d_z_disjoint():
    a = jnp.asarray([_box(0, 0, 0, 2, 2, 2, 0.3)])
    b = jnp.asarray([_box(0, 0, 5, 2, 2, 2, 0.3)])
    assert float(boxes_iou3d(a, b)[0, 0]) == 0.0


def test_points_in_boxes_rotated():
    box = jnp.asarray([_box(0, 0, 0, 4, 1, 2, np.pi / 2)])
    # after 90deg yaw, the long axis is along y
    pts = jnp.asarray([[0, 1.5, 0], [1.5, 0, 0]], jnp.float32)
    m = np.asarray(points_in_boxes(pts, box))
    assert m[0, 0] and not m[1, 0]


def test_nms_suppresses_duplicates():
    boxes = jnp.asarray([
        _box(0, 0, 0, 2, 2, 2, 0.0),
        _box(0.1, 0, 0, 2, 2, 2, 0.0),    # heavy overlap with first
        _box(10, 10, 0, 2, 2, 2, 0.0),
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms_bev(boxes, scores, 0.5))
    np.testing.assert_array_equal(keep, [True, False, True])


def _reference_circle_nms(dets_xy, scores, thresh):
    """Literal re-statement of the devkit greedy (centernet_utils.py:100-124)
    for golden comparison: squared center distance <= thresh suppresses."""
    order = np.argsort(-scores)
    suppressed = np.zeros(len(scores), bool)
    keep = []
    for _i, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order[_i + 1:]:
            if suppressed[j]:
                continue
            d = (dets_xy[i, 0] - dets_xy[j, 0]) ** 2 \
                + (dets_xy[i, 1] - dets_xy[j, 1]) ** 2
            if d <= thresh:
                suppressed[j] = True
    return sorted(keep)


def test_circle_nms_matches_reference_greedy():
    from multimodal_gar_tpu.ops.boxes3d import circle_nms
    rng = np.random.default_rng(7)
    n = 64
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, :2] = rng.uniform(0, 12, (n, 2))     # clustered -> suppressions
    boxes[:, 3:6] = 1.0
    scores = rng.uniform(0, 1, n).astype(np.float32)
    for thresh in (0.5, 2.0, 9.0):
        keep = np.asarray(circle_nms(jnp.asarray(boxes),
                                     jnp.asarray(scores), thresh))
        expect = _reference_circle_nms(boxes[:, :2], scores, thresh)
        assert sorted(np.flatnonzero(keep).tolist()) == expect, thresh


def test_circle_nms_simple_and_valid_mask():
    from multimodal_gar_tpu.ops.boxes3d import circle_nms
    boxes = jnp.asarray([
        _box(0, 0, 0, 2, 2, 2, 0.0),
        _box(1.0, 0, 0, 2, 2, 2, 0.0),    # d2=1 from first
        _box(10, 10, 0, 2, 2, 2, 0.0),
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(circle_nms(boxes, scores, 2.0))
    np.testing.assert_array_equal(keep, [True, False, True])
    # invalid rows never kept and never suppress others
    keep = np.asarray(circle_nms(boxes, scores, 2.0,
                                 valid=jnp.asarray([False, True, True])))
    np.testing.assert_array_equal(keep, [False, True, True])


def test_roiaware_pool3d_max():
    pts = jnp.asarray([[-0.9, -0.9, -0.9], [0.9, 0.9, 0.9],
                       [5, 5, 5]], jnp.float32)
    feats = jnp.asarray([[1.0], [2.0], [9.0]])
    box = jnp.asarray([_box(0, 0, 0, 2, 2, 2, 0.0)])
    grid = np.asarray(roiaware_pool3d(pts, feats, box, out_size=2))
    assert grid.shape == (1, 2, 2, 2, 1)
    assert grid[0, 0, 0, 0, 0] == 1.0
    assert grid[0, 1, 1, 1, 0] == 2.0
    assert grid.max() == 2.0              # outside point never pooled


def test_roipoint_pool3d():
    pts = jnp.asarray([[0, 0, 0], [0.5, 0, 0], [9, 9, 9]], jnp.float32)
    feats = jnp.asarray([[1.0], [2.0], [3.0]])
    boxes = jnp.asarray([_box(0, 0, 0, 2, 2, 2, 0.0),
                         _box(20, 20, 20, 1, 1, 1, 0.0)])
    pooled, empty = roipoint_pool3d(pts, feats, boxes, num_sampled_points=4)
    assert pooled.shape == (2, 4, 4)
    assert not bool(empty[0]) and bool(empty[1])
    assert np.allclose(np.asarray(pooled[1]), 0.0)


def test_vector_pool_cells_and_means():
    from multimodal_gar_tpu.ops.vector_pool import vector_pool
    support = jnp.asarray([[0.5, 0.5, 0.5], [-0.5, -0.5, -0.5],
                           [0.6, 0.6, 0.6], [5.0, 5.0, 5.0]], jnp.float32)
    feats = jnp.asarray([[1.0], [2.0], [3.0], [9.0]])
    valid = jnp.asarray([True, True, True, True])
    query = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    pooled, counts = vector_pool(support, feats, valid, query,
                                 radius=1.0, grid_size=2)
    assert pooled.shape == (1, 8, 4)
    c = np.asarray(counts)[0]
    assert c.sum() == 3                      # far point excluded
    # (+,+,+) octant holds points 0 and 2 -> mean feature 2.0
    octant = 1 * 4 + 1 * 2 + 1
    assert c[octant] == 2
    np.testing.assert_allclose(np.asarray(pooled)[0, octant, 3], 2.0)
    # (-,-,-) octant holds point 1
    assert c[0] == 1
    np.testing.assert_allclose(np.asarray(pooled)[0, 0, 3], 2.0)


def test_enlarge_and_nearest_bev_iou():
    from multimodal_gar_tpu.ops.boxes3d import (boxes3d_nearest_bev_iou,
                                                enlarge_box3d)
    b = jnp.asarray([[0, 0, 0, 2, 4, 2, 0.0]])
    e = np.asarray(enlarge_box3d(b, (0.5, 0.5, 0.5)))
    np.testing.assert_allclose(e[0, 3:6], [3, 5, 3])
    # 90deg-rotated box == swapped extents under nearest-bev
    a = jnp.asarray([[0, 0, 0, 2, 4, 2, 0.0]])
    c = jnp.asarray([[0, 0, 0, 4, 2, 2, np.pi / 2]])
    iou = float(boxes3d_nearest_bev_iou(a, c)[0, 0])
    assert abs(iou - 1.0) < 1e-5
