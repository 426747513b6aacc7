"""Batch and output pytrees shared across the data pipeline, model and trainer.

TPU-native replacement for the reference's 12-tuple batch
(dataloader.py:293/419) and 16-tuple model output (gat_model.py:1696):
fixed-shape, fully padded, with explicit validity masks.
"""
from __future__ import annotations

from typing import Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class Batch:
    """One padded batch of JRDB-Act key-frame samples."""
    images: jnp.ndarray                # (B, T, H, W, 3) float
    boxes2d: jnp.ndarray               # (B, N, 4) xyxy pixels
    boxes3d: jnp.ndarray               # (B, N, 7) cx cy cz dx dy dz yaw
    person_valid: jnp.ndarray          # (B, N) bool
    social_group_id: jnp.ndarray       # (B, N) int32, -1 padded
    actions: jnp.ndarray               # (B, N, 27) multi-hot float
    social_group_activity: jnp.ndarray # (B, N, 27) multi-hot float
    voxels: jnp.ndarray                # (B, M, P, 4) raw per-voxel points
    voxel_coords: jnp.ndarray          # (B, M, 3) int32 zyx
    voxel_num_points: jnp.ndarray      # (B, M) int32
    voxel_valid: jnp.ndarray           # (B, M) bool
    seq_id: jnp.ndarray                # (B,) int32
    frame_id: jnp.ndarray              # (B,) int32
    # host-built sparse-conv rulebook (data/rulebook.py): dict of (B, ...)
    # arrays; None -> index structures are built on device
    rulebook: Optional[dict] = None
    # spectral-loss inputs, precomputed in the pipeline's producer thread
    # when the configured loss needs them (train/losses.py prepare_eig_inputs)
    e_hat: Optional[jnp.ndarray] = None     # (B, max_vecs, N) float32
    e_count: Optional[jnp.ndarray] = None   # (B,) int32


@flax.struct.dataclass
class ModelOutputs:
    """Padded model outputs; every (B, N, ...) row is zero for invalid actors."""
    a_theta: jnp.ndarray               # (B, N, N) predicted adjacency
    pose: tuple                        # 3 x (B, N, 4) softmax
    interaction: tuple                 # (B,N,2), (B,N,4), (B,N,7), (B,N,5) sigmoid
    sg_pose: tuple                     # 3 x (B, N, 4) sigmoid
    sg_interaction: tuple              # (B,N,2), (B,N,4), (B,N,7), (B,N,5) sigmoid
    card: jnp.ndarray                  # (B, 1) predicted #groups
    group_ids: jnp.ndarray             # (B, N) int32 decoded group assignment
    rgb_features: Optional[jnp.ndarray] = None    # (B, N, D)
    lidar_features: Optional[jnp.ndarray] = None  # (B, N, D)
    fused_features: Optional[jnp.ndarray] = None  # (B, N, D)
