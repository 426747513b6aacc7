"""Pandaset + Argoverse2 adapter and CDS-protocol tests."""
import os
import pickle

import numpy as np
import pytest

from multimodal_gar_tpu.data.argo2 import (Argo2Dataset, argo2_to_boxes,
                                           boxes_to_argo2)
from multimodal_gar_tpu.data.pandaset import (PandasetDataset,
                                              ego_to_lidar_points,
                                              lidar_points_to_ego)
from multimodal_gar_tpu.eval.argo2_eval import (Argo2Frame, evaluate,
                                                filter_frames)


# ---- Pandaset --------------------------------------------------------

POSE = {"position": {"x": 10.0, "y": -5.0, "z": 2.0},
        "heading": {"w": np.cos(0.3), "x": 0.0, "y": 0.0,
                    "z": np.sin(0.3)}}        # yaw = 0.6 rad


def test_pandaset_pose_roundtrip():
    pts = np.random.default_rng(0).uniform(-10, 10, (50, 3))
    ego = lidar_points_to_ego(pts, POSE)
    back = ego_to_lidar_points(ego, POSE)
    np.testing.assert_allclose(back, pts, atol=1e-9)


@pytest.fixture
def pandaset_root(tmp_path):
    import pandas as pd

    seq = "001"
    lidar_dir = tmp_path / "dataset" / seq / "lidar"
    cub_dir = tmp_path / "dataset" / seq / "annotations" / "cuboids"
    os.makedirs(lidar_dir)
    os.makedirs(cub_dir)
    rng = np.random.default_rng(0)
    # world-frame points around the ego position
    world = rng.uniform(-20, 20, (300, 3)) + [10.0, -5.0, 2.0]
    df = pd.DataFrame({
        "x": world[:, 0], "y": world[:, 1], "z": world[:, 2],
        "i": rng.uniform(0, 255, 300), "t": np.zeros(300),
        "d": np.concatenate([np.zeros(200), np.ones(100)])})
    df.to_pickle(lidar_dir / "00.pkl.gz")
    cub = pd.DataFrame({
        "position.x": [12.0, 30.0], "position.y": [-4.0, -5.0],
        "position.z": [2.0, 2.0],
        "dimensions.x": [1.9, 1.9], "dimensions.y": [4.4, 4.4],
        "dimensions.z": [1.6, 1.6],
        "yaw": [0.2, 0.0], "label": ["Car", "Pickup Truck"],
        "cuboids.sensor_id": [-1, -1]})
    cub.to_pickle(cub_dir / "00.pkl.gz")
    with open(lidar_dir / "poses.json", "w") as f:
        import json
        json.dump([{"position": POSE["position"],
                    "heading": {k: float(v)
                                for k, v in POSE["heading"].items()}}], f)
    return tmp_path


def test_pandaset_frame(pandaset_root):
    ds = PandasetDataset(str(pandaset_root),
                         class_names=("Car",),
                         training_categories={"Pickup Truck": "Car"})
    assert len(ds) == 1
    fr = ds.frame(0)
    assert fr["points"].shape[1] == 4
    assert np.all(fr["points"][:, 3] <= 1.0)       # /255 normalization
    assert fr["gt_boxes"].shape == (2, 7)          # both map to Car
    assert fr["gt_names"] == ["Car", "Car"]
    # device filter: only d==0 points survive (200 of 300, minus range)
    assert len(fr["points"]) <= 200


def test_pandaset_prediction_roundtrip(pandaset_root):
    ds = PandasetDataset(str(pandaset_root), class_names=("Car",),
                         training_categories={"Pickup Truck": "Car"})
    fr = ds.frame(0)
    out = ds.predictions_to_world(
        fr["gt_boxes"], fr["gt_names"],
        np.ones(len(fr["gt_names"])), fr["pose"],
        fr["zrot_world_to_ego"])
    # world positions match the original cuboid centers
    np.testing.assert_allclose(
        np.sort(out["position.x"]), [12.0, 30.0], atol=1e-5)
    np.testing.assert_allclose(
        sorted(np.asarray(out["yaw"]) % (2 * np.pi))[0], 0.0, atol=1e-6)


# ---- Argo2 -----------------------------------------------------------


def test_argo2_box_format_roundtrip():
    boxes = np.array([[1, 2, 0.5, 4.2, 1.9, 1.6, 0.7],
                      [-3, 0, 0.2, 0.8, 0.7, 1.8, -2.0]], np.float32)
    rows = boxes_to_argo2(boxes)
    assert rows.shape == (2, 10)
    # unit quaternions, z-rotation only
    np.testing.assert_allclose(np.linalg.norm(rows[:, 6:], axis=1), 1.0,
                               atol=1e-9)
    np.testing.assert_allclose(rows[:, 7:9], 0.0, atol=1e-12)
    back = argo2_to_boxes(rows)
    np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-5)
    # yaw equal up to 2*pi
    assert np.allclose(np.cos(back[:, 6] - boxes[:, 6]), 1.0, atol=1e-6)


def _afr(gt_xyz, det_xyz, scores, cat="REGULAR_VEHICLE", npts=None):
    g = np.zeros((len(gt_xyz), 7), np.float32)
    g[:, :3] = gt_xyz
    g[:, 3:6] = [4, 2, 1.5]
    d = np.zeros((len(det_xyz), 7), np.float32)
    d[:, :3] = det_xyz
    d[:, 3:6] = [4, 2, 1.5]
    return Argo2Frame(
        gt_boxes=g, gt_names=[cat] * len(g),
        det_boxes=d, det_names=[cat] * len(d),
        det_scores=np.asarray(scores, np.float32),
        gt_num_interior_pts=(np.asarray(npts) if npts is not None
                             else None))


def test_argo2_perfect_cds():
    fr = _afr([[0, 0, 0], [10, 5, 0]], [[0, 0, 0], [10, 5, 0]],
              [0.9, 0.8])
    m = evaluate([fr], categories=("REGULAR_VEHICLE",))
    assert m["REGULAR_VEHICLE"]["AP"] == pytest.approx(1.0)
    assert m["REGULAR_VEHICLE"]["ATE"] == pytest.approx(0.0, abs=1e-9)
    assert m["REGULAR_VEHICLE"]["CDS"] == pytest.approx(1.0)
    assert m["mCDS"] == pytest.approx(1.0)


def test_argo2_translation_error_discounts_cds():
    # one TP offset by 1 m: strict `<` matching fails the 0.5 AND 1.0 m
    # thresholds, passes 2 and 4 m -> AP = 2/4, ATE = 1
    fr = _afr([[0, 0, 0]], [[1.0, 0, 0]], [0.9])
    m = evaluate([fr], categories=("REGULAR_VEHICLE",))
    r = m["REGULAR_VEHICLE"]
    assert r["ATE"] == pytest.approx(1.0, abs=1e-6)
    assert r["AP"] == pytest.approx(0.5, abs=0.01)
    assert r["CDS"] == pytest.approx(
        r["AP"] * np.mean([1 - 1.0 / 2.0, 1.0, 1.0]), abs=1e-6)


def test_argo2_no_tp_worst_errors():
    fr = _afr([[0, 0, 0]], [[50, 0, 0]], [0.9])
    m = evaluate([fr], categories=("REGULAR_VEHICLE",))
    r = m["REGULAR_VEHICLE"]
    assert r["AP"] == 0.0 and r["CDS"] == 0.0
    assert r["ATE"] == pytest.approx(2.0)
    assert r["AOE"] == pytest.approx(np.pi)


def test_argo2_range_and_interior_filter():
    fr = _afr([[0, 0, 0], [200, 0, 0], [5, 0, 0]],
              [[0, 0, 0]], [0.9], npts=[10, 10, 0])
    kept = filter_frames([fr])[0]
    assert len(kept.gt_names) == 1                 # far + empty GT dropped


@pytest.fixture
def argo2_root(tmp_path):
    os.makedirs(tmp_path / "training" / "velodyne")
    rng = np.random.default_rng(0)
    infos = []
    for i in range(2):
        pts = rng.uniform(-30, 30, (200, 4)).astype(np.float32)
        pts.tofile(tmp_path / "training" / "velodyne" / f"{i:06d}.bin")
        infos.append({
            "point_cloud": {"velodyne_path": f"velodyne/{i:06d}.bin"},
            "uuid": f"log{i}/16{i}000",
            "annos": {
                "name": np.array(["REGULAR_VEHICLE", "PEDESTRIAN"]),
                "location": np.array([[5, 1, 0.5], [-3, 2, 0.2]],
                                     np.float32),
                "dimensions": np.array([[4, 2, 1.5], [0.8, 0.8, 1.8]],
                                       np.float32),
                "rotation_y": np.array([0.3, 0.0], np.float32),
                "num_points_in_gt": np.array([40, 12])}})
    with open(tmp_path / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)
    return tmp_path


def test_argo2_adapter_and_eval(argo2_root):
    ds = Argo2Dataset(str(argo2_root), ["infos.pkl"])
    assert len(ds) == 2
    fr = ds.frame(0)
    assert fr["points"].shape[1] == 4
    assert fr["gt_boxes"].shape == (2, 7)
    det_annos = []
    for i in range(2):
        f = ds.frame(i)
        det_annos.append({"name": f["gt_names"],
                          "boxes_lidar": f["gt_boxes"],
                          "score": np.full(len(f["gt_names"]), 0.9)})
    m = ds.evaluation(det_annos)
    assert m["mAP"] == pytest.approx(1.0)
    assert m["mCDS"] == pytest.approx(1.0)
    batch = ds.det_batch([0], voxel_size=(0.8, 0.8, 0.5), max_voxels=256,
                         max_points=512, max_gt=8)
    assert batch.voxels.shape == (1, 256, 5, 4)
