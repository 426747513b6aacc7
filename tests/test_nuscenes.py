"""nuScenes adapter + NDS protocol tests.

Golden values are hand-derived from the public detection_cvpr_2019
protocol (see eval/nuscenes_eval.py docstring); the adapter tests run on a
synthetic info-pickle + .bin fixture mirroring the runtime layout of
pcdet/datasets/nuscenes/nuscenes_dataset.py:76-151.
"""
import os
import pickle

import numpy as np
import pytest

from multimodal_gar_tpu.data.nuscenes import (
    NuScenesDataset, quaternion_yaw, _quat_from_matrix, _yaw_matrix)
from multimodal_gar_tpu.eval.nuscenes_eval import (
    DIST_THS, Frames, NuscBox, accumulate, calc_ap, calc_tp, evaluate,
    filter_boxes, scale_iou, yaw_diff)


def box(xy, name, size=(2.0, 4.0, 1.5), yaw=0.0, score=-1.0, vel=(0, 0),
        attr="", num_pts=10):
    return NuscBox(translation=np.array([xy[0], xy[1], 1.0]),
                   size=np.array(size), yaw=yaw, name=name,
                   velocity=np.array(vel, np.float64), score=score,
                   attribute=attr, ego_dist=float(np.hypot(*xy)),
                   num_pts=num_pts)


def test_scale_iou_aligned():
    a = box((0, 0), "car", size=(2, 2, 2))
    b = box((5, 5), "car", size=(1, 2, 2))   # centers ignored
    assert scale_iou(a, b) == pytest.approx(0.5)
    assert scale_iou(a, a) == pytest.approx(1.0)


def test_yaw_diff_periods():
    a = box((0, 0), "car", yaw=0.1)
    b = box((0, 0), "car", yaw=0.1 + np.pi)
    assert yaw_diff(a, b) == pytest.approx(np.pi)
    assert yaw_diff(a, b, period=np.pi) == pytest.approx(0.0, abs=1e-12)


def test_accumulate_single_tp_golden():
    """2 GT, 1 TP pred at 0.3 m: AP = 4/9 at every threshold, ATE = 0.3."""
    gt: Frames = {"s0": [box((0, 0), "car"), box((20, 0), "car")]}
    pred: Frames = {"s0": [box((0.3, 0), "car", score=0.9)]}
    for th in DIST_THS:
        md = accumulate(gt, pred, "car", th)
        # recall plateaus at 0.5 with precision 1: normalized AP over
        # recall grid [0.11..1.0] has 40 points of (1 - 0.1) then zeros.
        assert calc_ap(md) == pytest.approx((40 * 0.9 / 90) / 0.9)
    md = accumulate(gt, pred, "car", 2.0)
    assert calc_tp(md, "trans_err") == pytest.approx(0.3, abs=1e-9)
    assert calc_tp(md, "scale_err") == pytest.approx(0.0, abs=1e-9)
    assert calc_tp(md, "orient_err") == pytest.approx(0.0, abs=1e-9)


def test_accumulate_miss_is_fp():
    gt: Frames = {"s0": [box((0, 0), "car")]}
    pred: Frames = {"s0": [box((3.0, 0), "car", score=0.9)]}
    md = accumulate(gt, pred, "car", 2.0)
    assert calc_ap(md) == 0.0
    assert accumulate(gt, pred, "pedestrian", 2.0) is None  # no GT


def test_perfect_predictions_nds_one():
    g1 = box((0, 0), "car", attr="vehicle.parked")
    g2 = box((10, 5), "car", attr="vehicle.parked", yaw=0.7)
    gt: Frames = {"s0": [g1, g2]}
    pred: Frames = {"s0": [
        box((0, 0), "car", score=0.9, attr="vehicle.parked"),
        box((10, 5), "car", score=0.8, attr="vehicle.parked", yaw=0.7)]}
    m = evaluate(gt, pred, class_names=("car",))
    assert m["mean_ap"] == pytest.approx(1.0)
    for v in m["tp_errors"].values():
        assert v == pytest.approx(0.0, abs=1e-9)
    assert m["nd_score"] == pytest.approx(1.0)


def test_barrier_exemptions_and_yaw_period():
    gt: Frames = {"s0": [box((0, 0), "barrier", yaw=0.0)]}
    pred: Frames = {"s0": [box((0, 0), "barrier", yaw=np.pi, score=0.9)]}
    m = evaluate(gt, pred, class_names=("barrier",))
    errs = m["label_tp_errors"]["barrier"]
    assert np.isnan(errs["vel_err"]) and np.isnan(errs["attr_err"])
    # flipped barrier matches under the pi yaw period
    assert errs["orient_err"] == pytest.approx(0.0, abs=1e-9)


def test_range_filtering():
    frames: Frames = {"s0": [box((60, 0), "car"),      # beyond 50 m
                             box((10, 0), "car"),
                             box((5, 0), "car", num_pts=0)]}  # empty GT
    kept = filter_boxes(frames, is_gt=True)
    assert len(kept["s0"]) == 1
    kept = filter_boxes(frames, is_gt=False)
    assert len(kept["s0"]) == 2                        # num_pts GT-only


def _rigid(yaw, t):
    m = np.eye(4)
    m[:3, :3] = _yaw_matrix(yaw)
    m[:3, 3] = t
    return m


@pytest.fixture
def nusc_root(tmp_path):
    """Two-sample synthetic nuScenes layout: info pickle + .bin files."""
    rng = np.random.default_rng(0)
    infos = []
    for i in range(2):
        pts = rng.uniform(-20, 20, (400, 5)).astype(np.float32)
        pts[:, 4] = 0
        rel = f"sweeps/lidar_{i}.bin"
        os.makedirs(tmp_path / "sweeps", exist_ok=True)
        pts.tofile(tmp_path / rel)
        sweep_rel = f"sweeps/sweep_{i}.bin"
        spts = rng.uniform(-20, 20, (300, 5)).astype(np.float32)
        spts.tofile(tmp_path / sweep_rel)
        car_from_global = _rigid(0.3 + i, (-100 - i, 50, 0))
        ref_from_car = _rigid(0.05, (-0.9, 0.0, -1.8))
        gt = np.array([[5.0, 2.0, 0.5, 4.0, 2.0, 1.5, 0.4, 1.0, 0.0],
                       [-8.0, 1.0, 0.3, 0.8, 0.8, 1.8, 0.0, 0.0, 0.0]],
                      np.float32)
        infos.append({
            "lidar_path": rel, "token": f"tok{i}",
            "sweeps": [{"lidar_path": sweep_rel,
                        "transform_matrix": _rigid(0.01, (0.5, 0, 0)),
                        "time_lag": 0.05}],
            "ref_from_car": ref_from_car,
            "car_from_global": car_from_global,
            "gt_boxes": gt,
            "gt_names": np.array(["car", "pedestrian"]),
            "gt_attributes": ["vehicle.moving", "pedestrian.standing"],
            "num_lidar_pts": np.array([50, 20]),
            "timestamp": 0.0})
    with open(tmp_path / "infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)
    return tmp_path


def test_adapter_frame_and_sweeps(nusc_root):
    ds = NuScenesDataset(str(nusc_root), ["infos_train.pkl"], max_sweeps=2)
    assert len(ds) == 2
    fr = ds.frame(0)
    assert fr["points"].shape[1] == 5
    # sweep points carry the time-lag channel
    assert np.any(fr["points"][:, 4] > 0)
    assert fr["gt_boxes"].shape == (2, 7)              # velocity dropped
    assert list(fr["gt_classes"]) == [
        ds.class_names.index("car") + 1,
        ds.class_names.index("pedestrian") + 1]
    ds9 = NuScenesDataset(str(nusc_root), ["infos_train.pkl"],
                          pred_velocity=True)
    assert ds9.frame(0)["gt_boxes"].shape == (2, 9)


def test_adapter_min_points_filter(nusc_root):
    ds = NuScenesDataset(str(nusc_root), ["infos_train.pkl"],
                         filter_min_points_in_gt=30)
    fr = ds.frame(0)
    assert fr["gt_names"] == ["car"]


def test_balanced_resampling(nusc_root):
    # with the two present classes, CBGS ratios are exactly 1: the 2
    # samples per class are resampled to 4 total (with duplicates)
    ds = NuScenesDataset(str(nusc_root), ["infos_train.pkl"],
                         class_names=("car", "pedestrian"),
                         balanced_resampling=True, seed=3)
    assert len(ds) == 4
    names = {n for info in ds.infos for n in info["gt_names"]}
    assert "car" in names


def test_adapter_det_batch(nusc_root):
    ds = NuScenesDataset(str(nusc_root), ["infos_train.pkl"])
    batch = ds.det_batch([0, 1], voxel_size=(0.4, 0.4, 0.25),
                         max_voxels=512, max_points=1024, max_gt=8)
    assert batch.voxels.shape == (2, 512, 5, 5)
    assert batch.points.shape == (2, 1024, 5)
    assert batch.gt_boxes.shape == (2, 8, 7)
    assert bool(batch.gt_valid[0, 0]) and not bool(batch.gt_valid[0, 2])


def test_global_roundtrip_yaw(nusc_root):
    """lidar->global yaw via quaternion equals rotation-composed yaw."""
    ds = NuScenesDataset(str(nusc_root), ["infos_train.pkl"])
    info = ds.infos[0]
    g = ds._global_from_lidar(info)
    yaw_l = 0.4
    q = _quat_from_matrix(g[:3, :3] @ _yaw_matrix(yaw_l))
    expect = yaw_l + np.arctan2(g[1, 0], g[0, 0])
    got = quaternion_yaw(q)
    assert np.cos(got - expect) == pytest.approx(1.0, abs=1e-9)


def test_end_to_end_nds_with_gt_as_dets(nusc_root):
    """Feeding the GT back as detections scores a perfect NDS."""
    ds = NuScenesDataset(str(nusc_root), ["infos_train.pkl"],
                         pred_velocity=True)
    det_annos = []
    for i in range(2):
        fr = ds.frame(i)
        det_annos.append({"token": fr["token"],
                          "boxes_lidar": fr["gt_boxes"],
                          "name": fr["gt_names"],
                          "score": np.full(len(fr["gt_names"]), 0.9)})
    m = ds.evaluation(det_annos)
    assert m["mean_ap"] == pytest.approx(1.0)
    assert m["tp_errors"]["trans_err"] == pytest.approx(0.0, abs=1e-6)
    assert m["tp_errors"]["orient_err"] == pytest.approx(0.0, abs=1e-6)
    assert m["tp_errors"]["vel_err"] == pytest.approx(0.0, abs=1e-6)
    # predicted attributes follow the motion rule and match the GT attrs
    assert m["tp_errors"]["attr_err"] == pytest.approx(0.0, abs=1e-9)
    assert m["nd_score"] == pytest.approx(1.0, abs=1e-6)
