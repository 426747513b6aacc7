"""Point-cloud / 3D-box world augmentations + GT-database sampler.

Capability parity with pcdet's DataAugmentor transform family
(pcdet/datasets/augmentor/data_augmentor.py + augmentor_utils.py — inactive
under mil3.yaml but part of the data-pipeline capability surface): random
world flip / rotation / scaling applied consistently to points and GT boxes,
plus the GT-sampling database augmentor
(pcdet/datasets/augmentor/database_sampler.py:1-504): sample object
boxes+points from a per-class database, reject samples whose rotated-BEV IoU
with existing or already-accepted boxes is nonzero, carve the landing zone
out of the scene, and paste the object points in.

All host-side numpy, config-driven, deterministic under a seeded Generator
(the BEV-IoU collision check reuses ops/boxes3d.py).
"""
from __future__ import annotations

import pickle
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np


def random_world_flip(points: np.ndarray, boxes: np.ndarray,
                      axes: Sequence[str],
                      rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
    """Flip the world along 'x' and/or 'y' with probability 0.5 each.

    Flipping along x negates y coordinates (and vice versa), and reflects the
    yaw angle accordingly (augmentor_utils.random_flip_along_{x,y} semantics).
    """
    points = points.copy()
    boxes = boxes.copy()
    for axis in axes:
        if not rng.integers(0, 2):
            continue
        if axis == "x":          # reflect across the x axis: y -> -y
            points[:, 1] = -points[:, 1]
            boxes[:, 1] = -boxes[:, 1]
            boxes[:, 6] = -boxes[:, 6]
        elif axis == "y":        # reflect across the y axis: x -> -x
            points[:, 0] = -points[:, 0]
            boxes[:, 0] = -boxes[:, 0]
            boxes[:, 6] = -(boxes[:, 6] + np.pi)
        else:
            raise ValueError(axis)
    return points, boxes


def random_world_rotation(points: np.ndarray, boxes: np.ndarray,
                          rot_range: Sequence[float],
                          rng: np.random.Generator):
    """Rotate the world about z by a uniform angle in rot_range."""
    angle = rng.uniform(rot_range[0], rot_range[1])
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s], [s, c]], points.dtype)
    points = points.copy()
    boxes = boxes.copy()
    points[:, :2] = points[:, :2] @ rot.T
    boxes[:, :2] = boxes[:, :2] @ rot.T
    boxes[:, 6] = boxes[:, 6] + angle
    return points, boxes


def random_world_scaling(points: np.ndarray, boxes: np.ndarray,
                         scale_range: Sequence[float],
                         rng: np.random.Generator):
    """Scale the world uniformly by a factor in scale_range."""
    scale = rng.uniform(scale_range[0], scale_range[1])
    points = points.copy()
    boxes = boxes.copy()
    points[:, :3] *= scale
    boxes[:, :6] *= scale
    return points, boxes


# ---------------------------------------------------------------------------
# GT-sampling database augmentor (database_sampler.py semantics)
# ---------------------------------------------------------------------------

def _bev_iou_host(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Rotated-BEV IoU in pure numpy (eval/kitti_eval.bev_iou).

    Deliberately NOT the jax op: this runs per class per sample inside the
    host data pipeline, and eager jax dispatch over the tunneled TPU costs
    ~30-100 ms per op (CLAUDE.md "never run eager per-op code")."""
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return np.zeros((len(boxes_a), len(boxes_b)), np.float32)
    from ..eval.kitti_eval import bev_iou
    return bev_iou(np.asarray(boxes_a[:, :7], np.float64),
                   np.asarray(boxes_b[:, :7], np.float64))


def _points_in_boxes_host(points: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """(N, P) bool membership of points in rotated 3D boxes, numpy."""
    if len(boxes) == 0 or len(points) == 0:
        return np.zeros((len(boxes), len(points)), bool)
    local = points[None, :, :3] - boxes[:, None, :3]          # (N, P, 3)
    c, s = np.cos(-boxes[:, 6]), np.sin(-boxes[:, 6])
    x = local[..., 0] * c[:, None] - local[..., 1] * s[:, None]
    y = local[..., 0] * s[:, None] + local[..., 1] * c[:, None]
    half = boxes[:, 3:6] / 2.0
    return ((np.abs(x) <= half[:, 0:1]) & (np.abs(y) <= half[:, 1:2])
            & (np.abs(local[..., 2]) <= half[:, 2:3]))


def build_gt_database(scenes: Sequence[Dict],
                      class_names: Sequence[str]) -> Dict[str, List[Dict]]:
    """Crop per-object point clouds out of scenes into a sampling database.

    scenes: dicts with 'points' (P, F), 'gt_boxes' (N, 7), 'gt_names' (N,).
    Returns {class_name: [{'name', 'box3d_lidar', 'points' (K, F) with xyz
    RELATIVE to the box center, 'num_points_in_gt'}, ...]} — the structure of
    the pcdet dbinfos pickle (database_sampler.py:33-43) built in-process.
    """
    db: Dict[str, List[Dict]] = {c: [] for c in class_names}
    for scene in scenes:
        points = np.asarray(scene["points"], np.float32)
        boxes = np.asarray(scene["gt_boxes"], np.float32)
        names = np.asarray(scene["gt_names"])
        inside = _points_in_boxes_host(points, boxes)
        for i, name in enumerate(names):
            if str(name) not in db:
                continue
            obj = points[inside[i]].copy()
            obj[:, :3] -= boxes[i, :3]
            db[str(name)].append({
                "name": str(name), "box3d_lidar": boxes[i].copy(),
                "points": obj, "num_points_in_gt": len(obj)})
    return db


class GTDatabaseSampler:
    """Paste-in GT sampling (database_sampler.py __call__ semantics).

    Per class: draw up to ``sample_num`` database objects (epoch-rotating
    shuffled pointer, :132-152), reject any whose rotated-BEV IoU with
    existing GT boxes or other accepted samples is nonzero (:465-470), carve
    scene points out of the (optionally enlarged) landing boxes and
    concatenate the object points, boxes, and names (:433-440).
    """

    def __init__(self, db: Union[str, Dict[str, List[Dict]]],
                 sample_groups: Dict[str, int],
                 min_points: int = 0,
                 limit_whole_scene: bool = False,
                 remove_extra_width: Sequence[float] = (0.0, 0.0, 0.0),
                 seed: int = 0):
        if isinstance(db, str):
            with open(db, "rb") as f:
                db = pickle.load(f)
        # filter_by_min_points (:119-131)
        self.db = {c: [e for e in entries
                       if e["num_points_in_gt"] >= min_points]
                   for c, entries in db.items()}
        self.sample_groups = dict(sample_groups)
        self.limit_whole_scene = limit_whole_scene
        self.remove_extra_width = np.asarray(remove_extra_width, np.float32)
        self.rng = np.random.default_rng(seed)
        self._pointers = {c: len(v) for c, v in self.db.items()}
        self._indices = {c: np.arange(len(v)) for c, v in self.db.items()}

    def _sample_with_fixed_number(self, cls: str, num: int) -> List[Dict]:
        """Rotating shuffled pointer (database_sampler.py:132-152)."""
        entries = self.db.get(cls, [])
        if not entries or num <= 0:
            return []
        ptr, indices = self._pointers[cls], self._indices[cls]
        if ptr + num >= len(entries):
            indices = self.rng.permutation(len(entries))
            ptr = 0
        out = [entries[i] for i in indices[ptr:ptr + num]]
        self._pointers[cls] = ptr + num
        self._indices[cls] = indices
        return out

    def __call__(self, points: np.ndarray, gt_boxes: np.ndarray,
                 gt_names: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        points = np.asarray(points, np.float32)
        existed = np.asarray(gt_boxes, np.float32).reshape(-1, gt_boxes.shape[-1])
        names = np.asarray(gt_names)
        accepted: List[Dict] = []

        for cls, sample_num in self.sample_groups.items():
            if self.limit_whole_scene:
                sample_num = sample_num - int(np.sum(names == cls))
            if sample_num <= 0:
                continue
            cand = self._sample_with_fixed_number(cls, sample_num)
            if not cand:
                continue
            boxes = np.stack([e["box3d_lidar"] for e in cand])
            iou1 = _bev_iou_host(boxes, existed)
            iou2 = np.array(_bev_iou_host(boxes, boxes))
            iou2[np.arange(len(boxes)), np.arange(len(boxes))] = 0
            iou1 = iou1 if iou1.shape[1] > 0 else iou2
            keep = (iou1.max(axis=1) + iou2.max(axis=1)) == 0
            for i in np.where(keep)[0]:
                accepted.append(cand[i])
            if keep.any():
                add = boxes[keep]
                # pad narrower DB boxes (7-dof) to the scene's box width
                # (e.g. 9-col with velocity); extra columns default to 0
                if add.shape[-1] < existed.shape[-1]:
                    add = np.pad(add, ((0, 0),
                                       (0, existed.shape[-1] - add.shape[-1])))
                existed = np.concatenate(
                    [existed, add[:, :existed.shape[-1]]], axis=0)

        if not accepted:
            return points, existed, names

        sampled_boxes = np.stack([e["box3d_lidar"] for e in accepted])
        # carve the landing zone (enlarged boxes) out of the scene points
        large = sampled_boxes.copy()
        large[:, 3:6] += 2.0 * self.remove_extra_width[None, :]
        inside_any = _points_in_boxes_host(points, large).any(axis=0)
        points = points[~inside_any]

        obj_points = []
        for e in accepted:
            obj = e["points"].copy()
            obj[:, :3] += e["box3d_lidar"][:3]
            obj_points.append(obj)
        obj_points = np.concatenate(obj_points, axis=0) if obj_points else \
            np.zeros((0, points.shape[-1]), np.float32)
        # pad narrower DB points (x y z i) to the scene's feature width
        # (e.g. 5-feature with sweep time); extra features default to 0
        if obj_points.shape[-1] < points.shape[-1]:
            obj_points = np.pad(
                obj_points,
                ((0, 0), (0, points.shape[-1] - obj_points.shape[-1])))
        points = np.concatenate(
            [obj_points[:, :points.shape[-1]], points], axis=0)
        names = np.concatenate(
            [names, np.asarray([e["name"] for e in accepted])])
        return points, existed, names


class WorldAugmentor:
    """Config-driven augmentation chain (DataAugmentor parity)."""

    def __init__(self, steps: Optional[List[Dict]] = None, seed: int = 0):
        self.steps = steps or []
        self.rng = np.random.default_rng(seed)

    def __call__(self, points: np.ndarray, boxes: np.ndarray):
        for step in self.steps:
            name = step["NAME"]
            if name == "random_world_flip":
                points, boxes = random_world_flip(
                    points, boxes, step.get("ALONG_AXIS_LIST", ["x"]), self.rng)
            elif name == "random_world_rotation":
                points, boxes = random_world_rotation(
                    points, boxes,
                    step.get("WORLD_ROT_ANGLE", [-np.pi / 4, np.pi / 4]),
                    self.rng)
            elif name == "random_world_scaling":
                points, boxes = random_world_scaling(
                    points, boxes, step.get("WORLD_SCALE_RANGE", [0.95, 1.05]),
                    self.rng)
            else:
                raise KeyError(f"unknown augmentation {name!r}")
        return points, boxes
