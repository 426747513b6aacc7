"""Waymo + Lyft adapter and eval-protocol tests on synthetic fixtures."""
import os
import pickle

import numpy as np
import pytest

from multimodal_gar_tpu.data.lyft import LyftDataset
from multimodal_gar_tpu.data.waymo import (
    WaymoDataset, reorder_rois_for_refining, transform_prebox_to_current)
from multimodal_gar_tpu.eval.lyft_eval import (
    LyftFrame, _envelope_ap, get_average_precisions)


def _pose(yaw, t):
    m = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    m[:2, :2] = [[c, -s], [s, c]]
    m[:3, 3] = t
    return m


@pytest.fixture
def waymo_root(tmp_path):
    seq = "segment-000"
    os.makedirs(tmp_path / "waymo_processed_data" / seq)
    rng = np.random.default_rng(0)
    infos = []
    for i in range(3):
        pts = np.zeros((200, 6), np.float32)
        pts[:, :2] = rng.uniform(-30, 30, (200, 2))
        pts[:, 2] = rng.uniform(-1.5, 3.5, 200)
        pts[:, 3] = rng.uniform(0, 4, 200)          # raw intensity
        pts[:, 5] = -1                              # NLZ: keep
        pts[:5, 5] = 1                              # 5 in-NLZ points
        np.save(tmp_path / "waymo_processed_data" / seq / ("%04d.npy" % i),
                pts)
        infos.append({
            "point_cloud": {"lidar_sequence": seq, "sample_idx": i},
            "frame_id": f"{seq}_{i}",
            "pose": _pose(0.1 * i, (2.0 * i, 0, 0)),
            "annos": {
                "name": np.array(["Vehicle", "Pedestrian", "unknown"]),
                "difficulty": np.array([1, 2, 0]),
                "gt_boxes_lidar": np.array(
                    [[5, 1, 0.5, 4, 2, 1.5, 0.2],
                     [-3, 2, 0.2, 0.8, 0.8, 1.7, 0.0],
                     [9, 9, 0, 1, 1, 1, 0]], np.float32),
                "num_points_in_gt": np.array([40, 0, 3])}})
    with open(tmp_path / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)
    return tmp_path


def test_waymo_frame_nlz_and_tanh(waymo_root):
    ds = WaymoDataset(str(waymo_root), ["infos.pkl"])
    fr = ds.frame(0)
    assert fr["points"].shape[1] == 5
    assert np.all(fr["points"][:, 3] <= 1.0)        # tanh applied
    # unknown dropped; Vehicle + Pedestrian kept
    assert fr["gt_names"] == ["Vehicle", "Pedestrian"]
    assert fr["gt_boxes"].shape == (2, 7)
    # NLZ rows removed
    ds2 = WaymoDataset(str(waymo_root), ["infos.pkl"],
                       disable_nlz_flag=True)
    assert len(ds2.frame(0)["points"]) >= len(fr["points"])


def test_waymo_empty_box_filter(waymo_root):
    ds = WaymoDataset(str(waymo_root), ["infos.pkl"],
                      filter_empty_boxes=True)
    fr = ds.frame(0, training=True)
    assert fr["gt_names"] == ["Vehicle"]            # Pedestrian has 0 pts
    assert ds.frame(0, training=False)["gt_names"] == [
        "Vehicle", "Pedestrian"]


def test_waymo_sequence_aggregation(waymo_root):
    ds = WaymoDataset(str(waymo_root), ["infos.pkl"],
                      sequence_offset=(-2, 0))
    assert ds.num_point_features == 6
    fr = ds.frame(2)
    pts = fr["points"]
    assert pts.shape[1] == 6
    # current frame stamped 0; past frames stamped 0.1/0.2 s
    stamps = np.unique(np.round(pts[:, 5].astype(np.float64), 3))
    np.testing.assert_allclose(stamps, [0.0, 0.1, 0.2], atol=1e-6)
    assert fr["poses"].shape == (12, 4)             # 3 stacked 4x4 poses


def test_waymo_onehot_timestamp(waymo_root):
    ds = WaymoDataset(str(waymo_root), ["infos.pkl"],
                      sequence_offset=(-2, 0), onehot_timestamp=True)
    assert ds.num_point_features == 8
    pts = ds.frame(2)["points"]
    assert pts.shape[1] == 8
    assert np.all(pts[:, 5:].sum(axis=1) == 1)      # one-hot rows


def test_waymo_prebox_transform_identity():
    boxes = np.array([[1, 2, 0.5, 4, 2, 1.5, 0.3, 1.0, 0.5, 0.9, 1]],
                     np.float32)
    same = transform_prebox_to_current(boxes, np.eye(4), np.eye(4))
    np.testing.assert_allclose(same, boxes, atol=1e-6)
    # pure translation of the ego: box moves by the relative offset
    moved = transform_prebox_to_current(
        boxes, _pose(0, (5, 0, 0)), _pose(0, (3, 0, 0)))
    np.testing.assert_allclose(moved[0, :3], [3, 2, 0.5], atol=1e-5)
    np.testing.assert_allclose(moved[0, 6:9], boxes[0, 6:9], atol=1e-6)


def test_waymo_pred_boxes_for_refining(waymo_root):
    seq_short = "segment-000"
    pred = {seq_short: {i: np.tile(
        np.array([[1, 0, 0, 4, 2, 1.5, 0, 1, 0, 0.8, 1]], np.float32),
        (i + 1, 1)) for i in range(3)}}
    ds = WaymoDataset(str(waymo_root), ["infos.pkl"],
                      sequence_offset=(-2, 0), pred_boxes_dict=pred)
    fr = ds.frame(2)
    assert fr["roi_boxes"].shape == (3, 3, 9)       # T=3 frames, Rmax=3
    assert fr["roi_scores"].shape == (3, 3)
    assert fr["roi_labels"].shape == (3, 3)
    padded = reorder_rois_for_refining([np.zeros((2, 11)),
                                        np.zeros((5, 11))])
    assert padded.shape == (2, 5, 11)


def test_waymo_det_batch_and_eval(waymo_root):
    ds = WaymoDataset(str(waymo_root), ["infos.pkl"])
    batch = ds.det_batch([0, 1], voxel_size=(0.8, 0.8, 0.5),
                         max_voxels=256, max_points=512, max_gt=8)
    assert batch.voxels.shape == (2, 256, 5, 5)
    # the kitti-mode eval maps names (Vehicle->Car) and wires straight
    # into eval/kitti_eval.evaluate (protocol itself golden-tested in
    # tests/test_kitti.py; tiny GT counts legitimately cap R40 AP)
    det_annos = []
    for i in range(3):
        fr = ds.frame(i)
        det_annos.append({"name": fr["gt_names"],
                          "boxes_lidar": fr["gt_boxes"],
                          "score": np.full(len(fr["gt_names"]), 0.9)})
    res = ds.evaluation(det_annos, eval_metric="kitti")
    assert "Car_3d_easy" in res and "Pedestrian_3d_easy" in res
    assert res["Car_3d_easy"] > 0 and res["Pedestrian_3d_easy"] > 0
    from multimodal_gar_tpu.eval.kitti_eval import (FrameAnnotations,
                                                    evaluate)
    direct = evaluate([FrameAnnotations(
        gt_boxes=ds.frame(i)["gt_boxes"],
        gt_names=["Car" if n == "Vehicle" else n
                  for n in ds.frame(i)["gt_names"]],
        gt_difficulty=np.zeros(2, np.int32),
        det_boxes=det_annos[i]["boxes_lidar"],
        det_names=["Car" if n == "Vehicle" else n
                   for n in det_annos[i]["name"]],
        det_scores=det_annos[i]["score"]) for i in range(3)],
        classes=("Car", "Pedestrian"))
    assert res["Car_3d_easy"] == pytest.approx(direct["Car_3d_easy"])


# ---- Lyft ------------------------------------------------------------


def test_lyft_envelope_ap_golden():
    """Single TP then FP: PR = [(0.5, 1.0), (0.5, 0.5)] -> AP = 0.5."""
    rec = np.array([0.5, 0.5])
    prec = np.array([1.0, 0.5])
    assert _envelope_ap(rec, prec) == pytest.approx(0.5)


def test_lyft_double_match_is_fp():
    """Second prediction hitting an already-matched GT is an FP even if a
    free GT overlaps less (the protocol takes argmax only)."""
    gt = np.array([[0, 0, 0, 4, 2, 2, 0.0]], np.float32)
    frame = LyftFrame(
        gt_boxes=gt, gt_names=["car"],
        det_boxes=np.array([[0, 0, 0, 4, 2, 2, 0.0],
                            [0.1, 0, 0, 4, 2, 2, 0.0]], np.float32),
        det_names=["car", "car"],
        det_scores=np.array([0.9, 0.8], np.float32))
    aps = get_average_precisions([frame], ("car",), (0.5,))
    # one TP at recall 1.0 precision 1.0, then FP: envelope AP = 1.0
    assert aps[0] == pytest.approx(1.0)


def test_lyft_strict_threshold():
    gt = np.array([[0, 0, 0, 4, 2, 2, 0.0]], np.float32)
    frame = LyftFrame(
        gt_boxes=gt, gt_names=["car"],
        det_boxes=gt.copy(), det_names=["car"],
        det_scores=np.array([0.9], np.float32))
    # IoU == 1.0 passes `> 0.9` but an exact-threshold match must fail
    assert get_average_precisions([frame], ("car",), (1.0,))[0] == 0.0
    assert get_average_precisions([frame], ("car",), (0.9,))[0] == 1.0


@pytest.fixture
def lyft_root(tmp_path):
    infos = []
    rng = np.random.default_rng(1)
    for i in range(2):
        # ragged tail: 3 extra floats beyond a multiple of 5
        pts = rng.uniform(-30, 30, (150, 5)).astype(np.float32)
        pts[:, 2] = rng.uniform(-4.0, 2.0, 150)
        raw = np.concatenate([pts.reshape(-1),
                              np.zeros(3, np.float32)])
        rel = f"lidar_{i}.bin"
        raw.tofile(tmp_path / rel)
        infos.append({
            "lidar_path": rel, "token": f"tk{i}",
            "sweeps": [],
            "gt_boxes": np.array([[2, 1, 0, 4.5, 1.9, 1.6, 0.3]],
                                 np.float32),
            "gt_names": np.array(["car"])})
    with open(tmp_path / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)
    return tmp_path


def test_lyft_adapter(lyft_root):
    ds = LyftDataset(str(lyft_root), ["infos.pkl"])
    fr = ds.frame(0)
    assert fr["points"].shape == (150, 5)            # ragged tail dropped
    assert fr["gt_boxes"].shape == (1, 7)
    det_annos = [{"name": ds.frame(i)["gt_names"],
                  "boxes_lidar": ds.frame(i)["gt_boxes"],
                  "score": np.array([0.9])} for i in range(2)]
    res = ds.evaluation(det_annos, eval_metric="lyft")
    assert res["AP_car"] == pytest.approx(1.0)
    assert res["mAP"] == pytest.approx(1.0 / len(ds.class_names))
    kitti_res = ds.evaluation(det_annos, eval_metric="kitti")
    assert kitti_res["Car_3d_easy"] > 0      # wiring; protocol tested
    assert "Cyclist_3d_easy" in kitti_res    # bicycle/motorcycle merge


# ---------------------------------------------------------------------------
# Official Waymo AP/APH protocol (eval/waymo_eval.py) — golden scenarios
# ---------------------------------------------------------------------------

def _wbox(x, y, heading=0.0, dims=(4.0, 2.0, 1.8)):
    import numpy as np
    return np.array([x, y, 1.0, dims[0], dims[1], dims[2], heading],
                    np.float32)


def _wframe(gt, det, gt_diff=None, gt_pts=None, det_scores=None,
            gt_types=None, det_types=None):
    import numpy as np
    from multimodal_gar_tpu.eval.waymo_eval import WaymoFrame
    gt = np.asarray(gt, np.float32).reshape(-1, 7)
    det = np.asarray(det, np.float32).reshape(-1, 7)
    g, d = len(gt), len(det)
    return WaymoFrame(
        gt_boxes=gt, gt_types=gt_types or ["Vehicle"] * g,
        gt_difficulty=np.asarray(gt_diff if gt_diff is not None
                                 else [1] * g, np.int32),
        gt_num_points=np.asarray(gt_pts if gt_pts is not None
                                 else [100] * g, np.int64),
        det_boxes=det, det_types=det_types or ["Vehicle"] * d,
        det_scores=np.asarray(det_scores if det_scores is not None
                              else [0.9] * d, np.float32))


def test_waymo_eval_perfect():
    import pytest
    from multimodal_gar_tpu.eval.waymo_eval import eval_class
    frames = [_wframe([_wbox(i * 10, 0)], [_wbox(i * 10, 0)])
              for i in range(4)]
    res = eval_class(frames, "Vehicle", level=2)
    assert res["ap"] == pytest.approx(100.0, abs=1e-6)
    assert res["aph"] == pytest.approx(100.0, abs=1e-6)


def test_waymo_eval_heading_flip_kills_aph_not_ap():
    import numpy as np
    import pytest
    from multimodal_gar_tpu.eval.waymo_eval import eval_class
    frames = [_wframe([_wbox(0, 0, 0.0)], [_wbox(0, 0, np.pi)])]
    res = eval_class(frames, "Vehicle", level=2)
    assert res["ap"] == pytest.approx(100.0, abs=1e-6)   # IoU unaffected
    assert res["aph"] == pytest.approx(0.0, abs=1e-6)    # 1 - pi/pi = 0


def test_waymo_eval_levels_and_point_reassignment():
    import pytest
    from multimodal_gar_tpu.eval.waymo_eval import eval_class
    # GT0: difficulty unset, 100 pts -> L1. GT1: unset, 3 pts -> L2 only.
    # Detector finds only GT0.
    frames = [_wframe([_wbox(0, 0), _wbox(20, 0)], [_wbox(0, 0)],
                      gt_diff=[0, 0], gt_pts=[100, 3])]
    l1 = eval_class(frames, "Vehicle", level=1)
    l2 = eval_class(frames, "Vehicle", level=2)
    assert l1["ap"] == pytest.approx(100.0, abs=1e-6)    # L2 GT ignored
    assert l2["ap"] == pytest.approx(50.0, abs=2.0)      # 1 of 2 found


def test_waymo_eval_zero_point_gt_dropped_and_fp_counted():
    import pytest
    from multimodal_gar_tpu.eval.waymo_eval import eval_class
    # zero-point GT dropped entirely; far detection is a pure FP scoring
    # ABOVE the TP, so full recall is only reachable at precision 0.5
    frames = [_wframe([_wbox(0, 0), _wbox(40, 0)],
                      [_wbox(0, 0), _wbox(80, 0)],
                      gt_pts=[100, 0], det_scores=[0.9, 0.95])]
    res = eval_class(frames, "Vehicle", level=2)
    # num_gt=1; cutoffs <= 0.9: tp=1 fp=1 -> p=0.5 r=1; above: tp=0
    assert res["ap"] == pytest.approx(50.0, abs=2.0)


def test_waymo_eval_hungarian_duplicate_suppression():
    import pytest
    from multimodal_gar_tpu.eval.waymo_eval import eval_class
    # two near-identical dets on one GT: only one matches, other is FP
    frames = [_wframe([_wbox(0, 0)],
                      [_wbox(0, 0), _wbox(0.05, 0)],
                      det_scores=[0.9, 0.85])]
    res = eval_class(frames, "Vehicle", level=2)
    # cutoffs <= 0.85: tp=1 fp=1 (p=.5); cutoffs in (.85,.9]: tp=1 fp=0
    assert res["ap"] == pytest.approx(100.0, abs=1e-6)   # r=1 @ p=1 exists


def test_waymo_evaluate_table_and_adapter_mode():
    import numpy as np
    from multimodal_gar_tpu.eval.waymo_eval import evaluate
    frames = [_wframe([_wbox(0, 0)], [_wbox(0, 0)]),
              _wframe([_wbox(0, 10, 0.2, dims=(0.9, 0.9, 1.7))],
                      [_wbox(0, 10, 0.2, dims=(0.9, 0.9, 1.7))],
                      gt_types=["Pedestrian"], det_types=["Pedestrian"])]
    table = evaluate(frames, classes=("Vehicle", "Pedestrian"))
    assert table["Vehicle_L2_AP"] == 100.0
    assert table["Pedestrian_L1_APH"] == 100.0
    assert "mean_L2_APH" in table
