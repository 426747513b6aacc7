"""ONCE + Custom dataset adapters and the ONCE eval protocol."""
import json
import os

import numpy as np
import pytest

from multimodal_gar_tpu.data.custom import CustomDataset
from multimodal_gar_tpu.data.once import OnceDataset
from multimodal_gar_tpu.eval.once_eval import OnceFrame, evaluate_once


def _box(x, y, yaw=0.0):
    return [float(x), float(y), 0.0, 4.0, 2.0, 1.5, float(yaw)]


def test_custom_dataset(tmp_path):
    os.makedirs(tmp_path / "points")
    os.makedirs(tmp_path / "labels")
    rng = np.random.default_rng(0)
    pts = rng.uniform([-10, -10, -2, 0], [10, 10, 1, 1],
                      size=(128, 4)).astype(np.float32)
    np.save(tmp_path / "points/000.npy", pts)
    with open(tmp_path / "labels/000.txt", "w") as f:
        f.write("1.0 2.0 0.0 4.0 2.0 1.5 0.3 Vehicle\n")
        f.write("5.0 5.0 0.0 0.8 0.6 1.7 0.0 Pedestrian\n")
    ds = CustomDataset(str(tmp_path), class_names=("Vehicle",),
                       map_class_to_kitti={"Vehicle": "Car"})
    assert len(ds) == 1
    fr = ds.frame(0)
    assert fr["gt_boxes"].shape == (1, 7)       # Pedestrian filtered
    assert fr["gt_classes"][0] == 1
    assert ds.kitti_name("Vehicle") == "Car"


def test_once_dataset(tmp_path):
    seq = "000027"
    d = tmp_path / "data" / seq
    os.makedirs(d / "lidar_roof")
    rng = np.random.default_rng(0)
    pts = rng.uniform([-20, -20, -3, 0], [20, 20, 2, 1],
                      size=(256, 4)).astype(np.float32)
    pts.tofile(d / "lidar_roof" / "1616100000000.bin")
    anno = {"calib": {"cam01": {}},
            "frames": [{"frame_id": "1616100000000",
                        "pose": [0, 0, 0, 1, 0, 0, 0],
                        "annos": {"names": ["Car", "Pedestrian", "Dog"],
                                  "boxes_3d": [_box(5, 0), _box(8, 2),
                                               _box(0, 0)]}}]}
    with open(d / f"{seq}.json", "w") as f:
        json.dump(anno, f)
    ds = OnceDataset(str(tmp_path))
    assert len(ds) == 1
    fr = ds.frame(0)
    assert fr["points"].shape[1] == 4
    assert fr["gt_boxes"].shape == (2, 7)       # "Dog" not in classes
    assert fr["gt_names"] == ["Car", "Pedestrian"]


def _once_frames(n=60, detect=True, flip_heading=False):
    frames = []
    for i in range(n):
        b = np.asarray([_box(10 + (i % 5) * 8, (i // 5) * 5)], np.float32)
        det = b.copy()
        if flip_heading:
            det[:, 6] += np.pi
        frames.append(OnceFrame(
            gt_boxes=b, gt_names=["Car"],
            det_boxes=det if detect else np.zeros((0, 7), np.float32),
            det_names=["Car"] if detect else [],
            det_scores=np.asarray([0.9], np.float32) if detect
            else np.zeros(0, np.float32)))
    return frames


def test_once_eval_perfect():
    res = evaluate_once(_once_frames(), classes=("Vehicle",))
    assert res["AP_Vehicle/overall"] == pytest.approx(100.0, abs=1e-3)
    # all GTs are at distance < 58m; buckets report where populated
    assert res["AP_mean/overall"] == pytest.approx(100.0, abs=1e-3)


def test_once_eval_heading_gate():
    """ONCE's ap_with_heading: opposite-facing detections cannot match."""
    res = evaluate_once(_once_frames(flip_heading=True),
                        classes=("Vehicle",))
    assert res["AP_Vehicle/overall"] == pytest.approx(0.0, abs=1e-3)


def test_once_eval_superclass_merge():
    frames = _once_frames(60)
    # detections labeled Truck still match Car GTs under the superclass
    for f in frames:
        f.det_names[0] = "Truck"
    res = evaluate_once(frames, classes=("Vehicle",))
    assert res["AP_Vehicle/overall"] == pytest.approx(100.0, abs=1e-3)
