"""Social-group decoding and group-feature pooling, fully vectorized.

TPU-native replacement for the reference's per-row Python loops:
  - group-id decode (threshold 0.5 -> first nonzero column), gat_model.py:1580-1592
  - per-group max-pool + broadcast, gat_model.py:1597-1614
Instead of iterating unique group ids, we build an (N, N) same-group mask and
take a masked max — O(N^2 D) dense work that XLA fuses, no dynamic shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .masked import NEG_INF


def decode_group_ids(a_theta: jnp.ndarray, valid: jnp.ndarray,
                     threshold: float = 0.5) -> jnp.ndarray:
    """Decode per-person group ids from a predicted adjacency matrix.

    Reference semantics (gat_model.py:1580-1592): detach A_theta, force the
    diagonal to 1, threshold at 0.5, and assign each person the index of the
    first nonzero column in their row. Padded rows/columns are excluded.

    Args:
      a_theta: (N, N) predicted adjacency in [0, 1].
      valid: (N,) bool actor mask.
    Returns:
      (N,) int32 group ids; padded entries get id = own index.
    """
    n = a_theta.shape[0]
    a = jax.lax.stop_gradient(a_theta)
    eye = jnp.eye(n, dtype=a.dtype)
    a = a * (1.0 - eye) + eye                       # fill_diagonal_(1.)
    linked = (a >= threshold) & valid[None, :] & valid[:, None]
    linked = linked | jnp.eye(n, dtype=bool)        # self-link always present
    # first True column per row == argmax over bool
    return jnp.argmax(linked, axis=1).astype(jnp.int32)


def group_max_pool(features: jnp.ndarray, group_ids: jnp.ndarray,
                   valid: jnp.ndarray) -> jnp.ndarray:
    """Per-group max-pooled feature, broadcast back to each member.

    Equivalent to the reference's loop over unique group ids with
    torch.max over members (gat_model.py:1606-1614).

    Args:
      features: (N, D).
      group_ids: (N,) int group assignment.
      valid: (N,) bool actor mask.
    Returns:
      (N, D) where row i = max over j with group_ids[j] == group_ids[i] of features[j].
    """
    same = (group_ids[:, None] == group_ids[None, :]) & valid[None, :]  # (N, N)
    same = same | jnp.eye(features.shape[0], dtype=bool)                # self always in
    masked = jnp.where(same[:, :, None], features[None, :, :], NEG_INF)
    return jnp.max(masked, axis=1)


def gt_adjacency(social_group_id: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Ground-truth adjacency from group ids (reference train_utils.py:96-110).

    A[i, j] = 1 if i == j or group[i] == group[j], restricted to valid actors;
    padded rows/cols are 0.
    """
    same = social_group_id[:, None] == social_group_id[None, :]
    n = social_group_id.shape[0]
    a = (same | jnp.eye(n, dtype=bool)).astype(jnp.float32)
    vmask = valid[:, None] & valid[None, :]
    return a * vmask.astype(jnp.float32)


def num_groups(social_group_id: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Number of distinct group ids among valid actors
    (reference train_utils.py:89-94 counts unique ids minus the -1 padding)."""
    # id j is counted if some valid actor has it and no earlier valid actor does
    sid = jnp.where(valid, social_group_id, jnp.iinfo(jnp.int32).min)
    n = sid.shape[0]
    first_occurrence = jnp.arange(n) == jnp.argmax(
        (sid[None, :] == sid[:, None]) & valid[None, :], axis=1)
    return jnp.sum(first_occurrence & valid).astype(jnp.float32)
