"""Point-cloud / 3D-box world augmentations.

Capability parity with pcdet's DataAugmentor transform family
(pcdet/datasets/augmentor/data_augmentor.py + augmentor_utils.py — inactive
under mil3.yaml but part of the data-pipeline capability surface): random
world flip / rotation / scaling applied consistently to points and GT boxes.
The GT-database sampler (paste-in detection augmentation) is detection-
specific and out of scope for the GAR task; see docs/ROUND1_NOTES.md.

All host-side numpy, config-driven, deterministic under a seeded Generator.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

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
