"""KITTI adapter (calib/label/velodyne parsing, batch assembly) + eval AP."""
import os

import numpy as np
import pytest

from multimodal_gar_tpu.data.kitti import (KittiDataset, KittiObject,
                                           boxes_camera_to_lidar,
                                           parse_calib, parse_label)
from multimodal_gar_tpu.eval.kitti_eval import (FrameAnnotations, bbox_iou_2d,
                                                bev_iou, eval_class, evaluate,
                                                iou_3d)

CALIB = """P0: 707.0 0.0 601.8 0.0 0.0 707.0 183.1 0.0 0.0 0.0 1.0 0.0
P1: 707.0 0.0 601.8 0.0 0.0 707.0 183.1 0.0 0.0 0.0 1.0 0.0
P2: 707.0 0.0 601.8 45.7 0.0 707.0 183.1 -0.34 0.0 0.0 1.0 0.004
P3: 707.0 0.0 601.8 0.0 0.0 707.0 183.1 0.0 0.0 0.0 1.0 0.0
R0_rect: 0.9999 0.0098 -0.0074 -0.0098 0.9999 -0.0043 0.0074 0.0043 0.9999
Tr_velo_to_cam: 0.0075 -0.9999 -0.0006 -0.0040 0.0148 0.0007 -0.9998 -0.0766 0.9998 0.0075 0.0148 -0.2717
"""

LABEL = """Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 1.65 1.67 3.64 -0.65 1.71 46.70 -1.59
Pedestrian 0.00 1 -1.41 585.85 180.69 600.30 220.90 1.86 0.60 2.02 4.59 1.32 45.84 -1.55
DontCare -1 -1 -10 503.89 169.71 590.61 190.13 -1 -1 -1 -1000 -1000 -1000 -10
"""


def _make_kitti_tree(root):
    base = os.path.join(root, "training")
    for sub in ["velodyne", "label_2", "calib"]:
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    rng = np.random.default_rng(0)
    pts = rng.uniform([0, -10, -2, 0], [40, 10, 1, 1],
                      size=(512, 4)).astype(np.float32)
    pts.tofile(os.path.join(base, "velodyne", "000000.bin"))
    with open(os.path.join(base, "calib", "000000.txt"), "w") as f:
        f.write(CALIB)
    with open(os.path.join(base, "label_2", "000000.txt"), "w") as f:
        f.write(LABEL)


def test_parse_calib_and_label(tmp_path):
    _make_kitti_tree(tmp_path)
    calib = parse_calib(str(tmp_path / "training/calib/000000.txt"))
    assert calib.P2.shape == (3, 4) and calib.R0.shape == (3, 3)
    objs = parse_label(str(tmp_path / "training/label_2/000000.txt"))
    assert len(objs) == 3
    assert objs[0].cls_type == "Car" and objs[0].l == 3.64
    assert objs[2].cls_type == "DontCare"
    # difficulty gating: Car h=26.8 px ... box height = 200.12-173.33 = 26.8
    assert objs[0].difficulty == 1     # >=25px, trunc 0, occ 0 -> moderate


def test_camera_to_lidar_roundtrip(tmp_path):
    _make_kitti_tree(tmp_path)
    calib = parse_calib(str(tmp_path / "training/calib/000000.txt"))
    objs = parse_label(str(tmp_path / "training/label_2/000000.txt"))[:1]
    boxes = boxes_camera_to_lidar(objs, calib)
    assert boxes.shape == (1, 7)
    # lidar x should be roughly the camera z (depth ~46.7m)
    assert 44 < boxes[0, 0] < 49
    assert boxes[0, 3] == pytest.approx(3.64)      # dx = l
    assert boxes[0, 5] == pytest.approx(1.65)      # dz = h
    # projecting the center back lands at a finite pixel with ~46m depth
    uv, depth = calib.lidar_to_img(boxes[:, :3])
    assert 45 < depth[0] < 49


def test_kitti_det_batch(tmp_path):
    _make_kitti_tree(tmp_path)
    ds = KittiDataset(str(tmp_path), split="train")
    assert len(ds) == 1
    fr = ds.frame(0)
    assert fr["points"].shape[1] == 4
    assert fr["gt_boxes"].shape == (2, 7)          # DontCare filtered
    batch = ds.det_batch([0], voxel_size=(0.4, 0.4, 0.4), max_voxels=256,
                         max_points=512, max_gt=8)
    assert batch.voxels.shape[0] == 1
    assert bool(batch.voxel_valid.sum() > 0)
    assert int(batch.gt_valid.sum()) == 2
    assert batch.rulebook is not None


# ---------------------------------------------------------------------------
# eval
# ---------------------------------------------------------------------------

def _box(x, y, yaw=0.0):
    return np.asarray([x, y, 0.0, 4.0, 2.0, 1.5, yaw], np.float32)


def test_iou_functions():
    a = _box(0, 0)[None]
    np.testing.assert_allclose(bev_iou(a, a)[0, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(iou_3d(a, a)[0, 0], 1.0, atol=1e-5)
    b = _box(0, 0, np.pi / 2)[None]               # swapped footprint 2x4
    iou = bev_iou(a, b)[0, 0]
    np.testing.assert_allclose(iou, 4.0 / 12.0, atol=1e-3)   # 2x2 / (8+8-4)
    assert bbox_iou_2d(np.asarray([[0, 0, 2, 2.]]),
                       np.asarray([[1, 1, 3, 3.]]))[0, 0] == pytest.approx(
        1 / 7)


def _frame(gts, dets, scores, gt_names=None, det_names=None):
    g = np.stack(gts) if gts else np.zeros((0, 7), np.float32)
    d = np.stack(dets) if dets else np.zeros((0, 7), np.float32)
    return FrameAnnotations(
        gt_boxes=g, gt_names=gt_names or ["Car"] * len(gts),
        gt_difficulty=np.zeros(len(gts), np.int32),
        det_boxes=d, det_names=det_names or ["Car"] * len(dets),
        det_scores=np.asarray(scores, np.float32))


def _many_frames(n_gt=50, detect_first=None, extra_fp=0):
    """n_gt single-GT frames at distinct spots; detect the first K of them.

    The devkit's threshold sampling needs ~41 TPs to fill every recall slot,
    so golden AP tests use realistically sized GT populations.
    """
    detect_first = n_gt if detect_first is None else detect_first
    rng = np.random.default_rng(0)
    frames = []
    for i in range(n_gt):
        gt = [_box(10 * (i % 7), 10 * (i // 7))]
        dets, scores = [], []
        if i < detect_first:
            dets.append(gt[0])
            scores.append(float(rng.uniform(0.5, 1.0)))
        for _ in range(extra_fp):
            dets.append(_box(200 + rng.uniform(0, 50), 200))
            scores.append(float(rng.uniform(0.5, 1.0)))
        frames.append(_frame(gt, dets, scores))
    return frames


def test_eval_perfect_detections_ap100():
    res = eval_class(_many_frames(50), "Car", difficulty=2, metric="bev")
    assert res["ap"] == pytest.approx(100.0, abs=1e-3)


def test_eval_half_recall_ap50():
    res = eval_class(_many_frames(80, detect_first=40), "Car",
                     difficulty=2, metric="3d")
    assert res["ap"] == pytest.approx(50.0, abs=3.0)


def test_eval_false_positive_lowers_precision():
    perfect = eval_class(_many_frames(50), "Car", 2, "bev")["ap"]
    with_fp = eval_class(_many_frames(50, extra_fp=1), "Car", 2, "bev")["ap"]
    assert with_fp < perfect
    assert perfect == pytest.approx(100.0, abs=1e-3)


def test_eval_dontcare_and_similar_not_penalized():
    # dets landing on Vans (similar to Car) are neither TP nor FP
    frames = _many_frames(50)
    for i in range(len(frames)):
        f = frames[i]
        frames[i] = FrameAnnotations(
            gt_boxes=np.vstack([f.gt_boxes, _box(100, 100)[None]]),
            gt_names=f.gt_names + ["Van"],
            gt_difficulty=np.zeros(len(f.gt_names) + 1, np.int32),
            det_boxes=np.vstack([f.det_boxes, _box(100, 100)[None]]),
            det_names=f.det_names + ["Car"],
            det_scores=np.concatenate([f.det_scores, [0.99]]))
    res = eval_class(frames, "Car", 2, "bev")
    assert res["ap"] == pytest.approx(100.0, abs=1e-3)


def _bbox_frames(n=50, delta=0.0, alphas=True):
    """n single-GT image-plane frames; detections exact with gt_alpha+delta."""
    rng = np.random.default_rng(0)
    frames = []
    for i in range(n):
        box = np.asarray([10 * (i % 7), 10 * (i // 7),
                          10 * (i % 7) + 8, 10 * (i // 7) + 8], np.float32)
        alpha = float(rng.uniform(-np.pi, np.pi))
        frames.append(FrameAnnotations(
            gt_boxes=box[None], gt_names=["Car"],
            gt_difficulty=np.zeros(1, np.int32),
            det_boxes=box[None], det_names=["Car"],
            det_scores=np.asarray([float(rng.uniform(0.5, 1.0))],
                                  np.float32),
            gt_alphas=np.asarray([alpha], np.float32) if alphas else None,
            det_alphas=np.asarray([alpha + delta], np.float32)
            if alphas else None))
    return frames


def test_aos_perfect_orientation_equals_ap():
    """AOS golden (devkit eval.py:168,237-263): exact alphas -> AOS == AP."""
    res = eval_class(_bbox_frames(50, delta=0.0), "Car", 2, "bbox")
    assert res["ap"] == pytest.approx(100.0, abs=1e-3)
    assert res["aos"] == pytest.approx(100.0, abs=1e-3)


def test_aos_opposite_orientation_zero():
    """Every TP rotated by pi: similarity (1+cos(pi))/2 = 0 -> AOS 0."""
    res = eval_class(_bbox_frames(50, delta=np.pi), "Car", 2, "bbox")
    assert res["ap"] == pytest.approx(100.0, abs=1e-3)
    assert res["aos"] == pytest.approx(0.0, abs=1e-4)


def test_aos_quarter_turn_half_similarity():
    """delta = pi/2 on every TP: per-TP similarity exactly 0.5 -> AOS 50."""
    res = eval_class(_bbox_frames(50, delta=np.pi / 2), "Car", 2, "bbox")
    assert res["ap"] == pytest.approx(100.0, abs=1e-3)
    assert res["aos"] == pytest.approx(50.0, abs=1e-2)


def test_aos_in_evaluate_table_only_with_alphas():
    table = evaluate(_bbox_frames(50), classes=("Car",), metrics=("bbox",))
    assert table["Car_aos_moderate"] == pytest.approx(100.0, abs=1e-3)
    table2 = evaluate(_bbox_frames(50, alphas=False), classes=("Car",),
                      metrics=("bbox",))
    assert "Car_aos_moderate" not in table2
    assert table2["Car_bbox_moderate"] == pytest.approx(100.0, abs=1e-3)


def test_evaluate_table_keys():
    table = evaluate(_many_frames(50), classes=("Car",),
                     metrics=("bev", "3d"))
    assert "Car_bev_moderate" in table and "Car_3d_hard" in table
    assert table["Car_bev_easy"] == pytest.approx(100.0, abs=1e-3)


def test_dataset_registry(tmp_path):
    """build_dataset + det_batches sharding (data/registry.py)."""
    import os
    import pickle

    import numpy as np

    from multimodal_gar_tpu.data.registry import (available_datasets,
                                                  build_dataset, det_batches)
    assert "KittiDataset" in available_datasets()
    assert "WaymoDataset" in available_datasets()

    # tiny kitti fixture
    base = tmp_path / "training"
    for sub in ("velodyne", "label_2", "calib"):
        os.makedirs(base / sub)
    rng = np.random.default_rng(0)
    for i in range(4):
        pts = rng.uniform(0, 30, (200, 4)).astype(np.float32)
        pts[:, 2] = rng.uniform(-1.5, 0.5, 200)
        pts.tofile(base / "velodyne" / f"{i:06d}.bin")
        with open(base / "calib" / f"{i:06d}.txt", "w") as f:
            f.write("P2: 700 0 600 0 0 700 200 0 0 0 1 0\n")
            f.write("R0_rect: 1 0 0 0 1 0 0 0 1\n")
            f.write("Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0\n")
        with open(base / "label_2" / f"{i:06d}.txt", "w") as f:
            f.write("Car 0 0 0 100 100 200 250 1.5 1.7 4.1 "
                    "2.0 1.6 8.0 0.2\n")
    ds = build_dataset("KittiDataset", root=str(tmp_path), split="train")
    assert len(ds) == 4

    batches = list(det_batches(ds, 2, (0.4, 0.4, 0.5), 256,
                               max_points=512, max_gt=4, seed=1, epoch=0))
    assert len(batches) == 2
    assert batches[0].voxels.shape == (2, 256, 5, 4)
    # rank sharding: two ranks see disjoint halves in the same epoch order
    a = list(det_batches(ds, 1, (0.4, 0.4, 0.5), 256, max_points=512,
                         max_gt=4, seed=1, epoch=3, rank=0, world=2))
    b = list(det_batches(ds, 1, (0.4, 0.4, 0.5), 256, max_points=512,
                         max_gt=4, seed=1, epoch=3, rank=1, world=2))
    assert len(a) == 2 and len(b) == 2


def test_offline_builders_roundtrip(tmp_path):
    """create_kitti_infos -> create_groundtruth_database -> load_dbinfos
    round-trip on a synthetic raw tree (kitti_dataset.py:150-471 parity)."""
    import pickle

    from multimodal_gar_tpu.data.builders import (
        create_groundtruth_database, create_kitti_infos, load_dbinfos)

    _make_kitti_tree(tmp_path)
    # put dense points inside the Car box so the crop is non-empty
    base = os.path.join(tmp_path, "training")
    ds0 = KittiDataset(str(tmp_path), split="train")
    box = ds0.frame(0)["gt_boxes"][0]
    rng = np.random.default_rng(1)
    extra = rng.uniform(-0.5, 0.5, size=(64, 4)).astype(np.float32)
    extra[:, :3] += box[:3]
    pts = np.fromfile(os.path.join(base, "velodyne", "000000.bin"),
                      np.float32).reshape(-1, 4)
    np.vstack([pts, extra]).tofile(
        os.path.join(base, "velodyne", "000000.bin"))

    paths = create_kitti_infos(str(tmp_path), splits=("train",))
    with open(paths["train"], "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 1
    annos = infos[0]["annos"]
    # DontCare sorted to the tail with index -1, lidar boxes real-only
    assert list(annos["name"]) == ["Car", "Pedestrian", "DontCare"]
    assert list(annos["index"]) == [0, 1, -1]
    assert annos["gt_boxes_lidar"].shape == (2, 7)
    assert infos[0]["calib"]["P2"].shape == (4, 4)
    assert annos["num_points_in_gt"][2] == -1      # DontCare sentinel
    assert annos["num_points_in_gt"][0] >= 1       # planted points found
    # adapter and builder agree on the lidar boxes
    np.testing.assert_allclose(annos["gt_boxes_lidar"],
                               ds0.frame(0)["gt_boxes"], atol=1e-5)

    db_path = create_groundtruth_database(str(tmp_path), paths["train"])
    db = load_dbinfos(db_path, root=str(tmp_path))
    assert "Car" in db and db["Car"][0]["num_points_in_gt"] >= 1
    e = db["Car"][0]
    assert e["points"].shape == (e["num_points_in_gt"], 4)
    # crops are center-relative: all inside the half-extent box
    assert (np.abs(e["points"][:, 0]) <= e["box3d_lidar"][3]).all()

    # the loaded database drives the GT-sampling augmentor
    from multimodal_gar_tpu.data.augmentor import GTDatabaseSampler
    sam = GTDatabaseSampler(db, {"Car": 2}, seed=0)
    p2, b2, n2 = sam(np.zeros((8, 4), np.float32),
                     np.zeros((0, 7), np.float32), np.asarray([]))
    assert len(b2) >= 1 and (n2 == "Car").any()
