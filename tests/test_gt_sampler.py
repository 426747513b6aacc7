"""GT-sampling database augmentor (database_sampler.py semantics)."""
import numpy as np

from multimodal_gar_tpu.data.augmentor import (GTDatabaseSampler,
                                               _points_in_boxes_host,
                                               build_gt_database)


def _scene_with_objects(centers, n_bg=50, seed=0):
    """A scene with unit boxes at given centers, 8 points inside each, plus
    uniform background points far away."""
    rng = np.random.default_rng(seed)
    boxes = np.zeros((len(centers), 7), np.float32)
    boxes[:, :3] = centers
    boxes[:, 3:6] = 1.0
    pts = [rng.uniform(-0.4, 0.4, (8, 3)).astype(np.float32) + c
           for c in np.asarray(centers, np.float32)]
    bg = rng.uniform(30, 60, (n_bg, 3)).astype(np.float32)
    points = np.concatenate(pts + [bg]).astype(np.float32)
    intens = np.full((len(points), 1), 0.5, np.float32)
    return (np.concatenate([points, intens], axis=1), boxes,
            np.asarray(["pedestrian"] * len(centers)))


def test_build_database_crops_local_points():
    points, boxes, names = _scene_with_objects([[0, 0, 0], [5, 5, 0]])
    db = build_gt_database([{"points": points, "gt_boxes": boxes,
                             "gt_names": names}], ["pedestrian"])
    assert len(db["pedestrian"]) == 2
    for e in db["pedestrian"]:
        assert e["num_points_in_gt"] == 8
        # stored points are box-local
        assert np.abs(e["points"][:, :3]).max() < 0.5


def test_sampler_pastes_and_respects_collisions():
    # database built from a source scene with objects at A=(0,0,0), B=(5,5,0)
    src = _scene_with_objects([[0, 0, 0], [5, 5, 0]])
    db = build_gt_database([{"points": src[0], "gt_boxes": src[1],
                             "gt_names": src[2]}], ["pedestrian"])
    sampler = GTDatabaseSampler(db, {"pedestrian": 2}, seed=1)

    # target scene: an existing GT box sits exactly at A -> the A sample must
    # be rejected (BEV IoU > 0); the B sample lands
    tgt_points, tgt_boxes, tgt_names = _scene_with_objects([[0, 0, 0]],
                                                           n_bg=30, seed=2)
    # put some scene points INSIDE B's landing zone: they must be carved out
    squatters = np.array([[5.1, 5.1, 0.1, 0.5], [4.9, 4.9, -0.1, 0.5]],
                         np.float32)
    tgt_points = np.concatenate([tgt_points, squatters])

    new_pts, new_boxes, new_names = sampler(tgt_points, tgt_boxes, tgt_names)
    assert len(new_boxes) == 2                      # existing + B only
    np.testing.assert_allclose(new_boxes[1, :3], [5, 5, 0], atol=1e-6)
    assert list(new_names) == ["pedestrian", "pedestrian"]
    # squatters carved out, object points pasted in
    inside_b = _points_in_boxes_host(new_pts, new_boxes[1:2])[0]
    assert inside_b.sum() == 8
    d = np.linalg.norm(new_pts[:, :2] - squatters[0, :2], axis=1)
    assert d.min() > 1e-3


def test_sampler_min_points_filter_and_limit_whole_scene():
    src = _scene_with_objects([[0, 0, 0], [5, 5, 0]])
    db = build_gt_database([{"points": src[0], "gt_boxes": src[1],
                             "gt_names": src[2]}], ["pedestrian"])
    # min_points above 8 filters everything out
    empty = GTDatabaseSampler(db, {"pedestrian": 2}, min_points=9)
    pts, boxes, names = _scene_with_objects([[9, 9, 0]], n_bg=5)
    p2, b2, n2 = empty(pts, boxes, names)
    assert len(b2) == 1 and len(p2) == len(pts)

    # limit_whole_scene: scene already has 1 pedestrian, target 2 -> add <=1
    limited = GTDatabaseSampler(db, {"pedestrian": 2},
                                limit_whole_scene=True, seed=3)
    p3, b3, n3 = limited(pts, boxes, names)
    assert len(b3) <= 2


def test_sampler_pointer_rotation_is_deterministic():
    src = _scene_with_objects([[0, 0, 0], [5, 5, 0], [10, 0, 0], [0, 10, 0]])
    db = build_gt_database([{"points": src[0], "gt_boxes": src[1],
                             "gt_names": src[2]}], ["pedestrian"])
    s1 = GTDatabaseSampler(db, {"pedestrian": 2}, seed=7)
    s2 = GTDatabaseSampler(db, {"pedestrian": 2}, seed=7)
    scene = _scene_with_objects([[20, 20, 0]], n_bg=10)
    for _ in range(3):
        r1 = s1(*scene)
        r2 = s2(*scene)
        np.testing.assert_allclose(r1[1], r2[1])
