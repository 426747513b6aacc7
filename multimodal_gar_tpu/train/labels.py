"""Label engineering: 27-action -> 7-partition split, GT adjacency, group counts.

Capability parity with reference train_utils.py:
  - get_label_from_action (:174-221) — the JRDB-Act 27-class multi-hot vector is
    split into 3 pose partitions (softmax/CE) + 4 interaction partitions
    (sigmoid/BCE), each non-final partition gaining an "other" class that is the
    max over the less-frequent classes.
  - get_adjacency (:96-110), get_num_social_group (:89-94) — see ops.grouping.

All functions are batched + masked (padded rows produce zero labels) instead of
the reference's per-item Python loops.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def partition_action_labels(actions: jnp.ndarray, valid: jnp.ndarray
                            ) -> Tuple[jnp.ndarray, ...]:
    """Split (B, N, 27) multi-hot actions into the 7 head partitions.

    Index map (reference train_utils.py:189-211; note indices 10, 25, 26 are
    intentionally skipped — a reference quirk preserved for parity):
      pose_1   = a[:, 0:3]   ++ max(a[:, 3:10])     -> (B, N, 4)
      pose_2   = a[:, 3:6]   ++ max(a[:, 6:10])     -> (B, N, 4)
      pose_3   = a[:, 6:10]                          -> (B, N, 4)
      intrctn_1 = [max(a[:, 11:25]), 1 - max(...)]   -> (B, N, 2)
      intrctn_2 = a[:, 11:14] ++ max(a[:, 14:25])    -> (B, N, 4)
      intrctn_3 = a[:, 14:20] ++ max(a[:, 20:25])    -> (B, N, 7)
      intrctn_4 = a[:, 20:25]                        -> (B, N, 5)
    """
    a = actions
    vm = valid[..., None].astype(a.dtype)

    def mx(lo, hi):
        return jnp.max(a[..., lo:hi], axis=-1, keepdims=True)

    pose_1 = jnp.concatenate([a[..., 0:3], mx(3, 10)], axis=-1) * vm
    pose_2 = jnp.concatenate([a[..., 3:6], mx(6, 10)], axis=-1) * vm
    pose_3 = a[..., 6:10] * vm

    any_int = mx(11, 25)
    intrctn_1 = jnp.concatenate([any_int, 1.0 - any_int], axis=-1) * vm
    intrctn_2 = jnp.concatenate([a[..., 11:14], mx(14, 25)], axis=-1) * vm
    intrctn_3 = jnp.concatenate([a[..., 14:20], mx(20, 25)], axis=-1) * vm
    intrctn_4 = a[..., 20:25] * vm

    return pose_1, pose_2, pose_3, intrctn_1, intrctn_2, intrctn_3, intrctn_4
