"""Loss functions: grouping (BCE / weighted BCE / spectral), action, activity.

Capability parity with the loss assembly in reference train_func.py:172-256 and
train_utils.py:112-171, batched + masked:
  - L_bce   — BCE(A_theta, A_hat) over each scene's valid N x N block.
  - L_bce2  — class-ratio-weighted, diagonal-masked BCE (train_func.py:183-191).
  - L_eig   — spectral grouping loss; the zero-eigenvectors of L_hat^T L_hat are
    GT-side quantities, computed on HOST per batch (numpy eigendecomposition of
    label data) and fed to the device loss (SURVEY.md §7.2.4).
  - L_mse   — cardinality MSE (card_net vs #groups).
  - L_pose / L_interaction — CE-on-softmaxed-probs (a reference quirk kept for
    parity) + BCE over the 4 interaction partitions.
  - SG_L_*  — the social-group-activity versions (all BCE).

Reference quirks in the batch loop (train_func.py:176-239: L_bce / L_pose are
*overwritten* per item while L_interaction accumulates — batch_size was 1) are
replaced by a clean mean over batch items; identical at batch_size=1.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grouping import gt_adjacency, num_groups
from ..types import Batch, ModelOutputs
from .labels import partition_action_labels

EPS = 1e-7


def _bce(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy on probabilities (torch BCELoss core)."""
    p = jnp.clip(pred, EPS, 1.0 - EPS)
    return -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def masked_bce_mean(pred, target, mask):
    """Mean BCE over the masked elements of `pred`.

    The mask is broadcast to pred's full shape before counting, so a
    (B, N, 1) row mask against (B, N, C) predictions divides by rows*C —
    matching torch nn.BCELoss()'s all-element mean (train_func.py:209-239)
    restricted to valid rows. (A row-count denominator would scale each
    partition loss by its class width, weighting partitions 2:4:7:5.)
    """
    m = jnp.broadcast_to(mask, pred.shape).astype(pred.dtype)
    return jnp.sum(_bce(pred, target) * m) / jnp.maximum(jnp.sum(m), 1.0)


def adjacency_bce(a_theta: jnp.ndarray, a_hat: jnp.ndarray,
                  valid: jnp.ndarray) -> jnp.ndarray:
    """Per-scene mean BCE over the valid N x N block, then mean over batch."""
    pair = (valid[:, None, :] & valid[:, :, None]).astype(a_theta.dtype)
    per_scene = jnp.sum(_bce(a_theta, a_hat) * pair, axis=(1, 2)) \
        / jnp.maximum(jnp.sum(pair, axis=(1, 2)), 1.0)
    return jnp.mean(per_scene)


def adjacency_bce_weighted(a_theta: jnp.ndarray, a_hat: jnp.ndarray,
                           valid: jnp.ndarray) -> jnp.ndarray:
    """Class-ratio-weighted masked BCE (reference L_bce2, train_func.py:183-191).

    Off-diagonal entries only; positive (same-group) pairs are up-weighted by
    (#neg) / (3 * #pos + 1).
    """
    b, n, _ = a_theta.shape
    pair = (valid[:, None, :] & valid[:, :, None]).astype(a_theta.dtype)
    off_diag = pair * (1.0 - jnp.eye(n, dtype=a_theta.dtype)[None])
    pos = a_hat * off_diag
    neg = (1.0 - a_hat) * off_diag
    num_pos = jnp.sum(pos, axis=(1, 2))
    num_total = jnp.sum(off_diag, axis=(1, 2))
    ratio = (num_total - num_pos) / (3.0 * num_pos + 1.0)       # (B,)
    bce = _bce(a_theta, a_hat) * off_diag
    weighted = ratio[:, None, None] * bce * pos + bce * neg
    per_scene = jnp.sum(weighted, axis=(1, 2)) / jnp.maximum(num_total, 1.0)
    return jnp.mean(per_scene)


def ce_on_probs(pred_probs: jnp.ndarray, target: jnp.ndarray,
                valid: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.CrossEntropyLoss(softmax(x), multi-hot target) reproduced.

    The reference feeds *already-softmaxed* head outputs into CrossEntropyLoss
    with probabilistic (unnormalized multi-hot) targets (train_func.py:209),
    i.e. loss = mean_rows( -sum_c t_c * log_softmax(p)_c ).
    """
    logp = jax.nn.log_softmax(pred_probs, axis=-1)
    per_row = -jnp.sum(target * logp, axis=-1)                  # (B, N)
    m = valid.astype(per_row.dtype)
    return jnp.sum(per_row * m) / jnp.maximum(jnp.sum(m), 1.0)


def zero_eigvecs_host(a_hat: np.ndarray, n_valid: int, max_vecs: int
                      ) -> Tuple[np.ndarray, int]:
    """HOST: zero-eigenvalue eigenvectors of L_hat^T L_hat (train_utils.py:125-136).

    Returns (max_vecs, N) padded eigenvector rows + count. This is pure label
    processing (A_hat is GT), so it runs in the input pipeline, not on device.

    Deliberate fixes vs the reference (train_utils.py:128-136): the reference
    takes ROWS of the eigenvector matrix (``evecs[val]`` — a transpose bug;
    eigenvectors are columns) and keeps only eigenvalues EXACTLY equal to 0.0
    (``abs(evals[val]).item() == 0``), which numerically almost never fires,
    silently disabling L_eig. Here: proper column eigenvectors via eigh with a
    1e-9 tolerance.
    """
    n = a_hat.shape[0]
    sub = a_hat[:n_valid, :n_valid].astype(np.float64)
    lap = np.diag(sub.sum(axis=1)) - sub
    m = lap.T @ lap
    evals, evecs = np.linalg.eigh(m)
    keep = np.abs(evals) < 1e-9
    vecs = evecs[:, keep].T                                     # (k, n_valid)
    k = min(vecs.shape[0], max_vecs)
    out = np.zeros((max_vecs, n), np.float32)
    out[:k, :n_valid] = vecs[:k]
    return out, k


def prepare_eig_inputs(social_group_id: np.ndarray, valid: np.ndarray,
                       max_vecs: int = 16):
    """HOST: batched zero-eigvec prep for the spectral loss.

    Called by the train loop (or pipeline) when the configured loss includes
    L_eig; the eigendecomposition is of GT label data only (SURVEY.md §7.2.4).

    Returns (e_hat (B, max_vecs, N) float32, e_count (B,) int32).
    """
    from ..ops import grouping as _g
    import jax

    b, n = social_group_id.shape
    e_hat = np.zeros((b, max_vecs, n), np.float32)
    e_count = np.zeros((b,), np.int32)
    for i in range(b):
        nv = int(valid[i].sum())
        if nv == 0:
            continue
        sid = social_group_id[i][:nv]
        a = (sid[:, None] == sid[None, :]) | np.eye(nv, dtype=bool)
        full = np.zeros((n, n), np.float32)
        full[:nv, :nv] = a
        e_hat[i], e_count[i] = zero_eigvecs_host(full, nv, max_vecs)
    return e_hat, e_count


def eig_loss(a_theta: jnp.ndarray, e_hat: jnp.ndarray, e_count: jnp.ndarray,
             valid: jnp.ndarray, alpha: float = 1.0, beta: float = 1.0
             ) -> jnp.ndarray:
    """Device part of the spectral loss (train_utils.py:117-144).

    loss = e L_theta^T L_theta e^T summed over the zero-eigvecs e of the GT
    Laplacian product, + alpha * exp(-beta * tr(Lbar_theta^T L_theta)) with
    Lbar = L_theta (I - e^T e).
    """
    def per_item(a, e, k, v):
        n = a.shape[0]
        pair = (v[:, None] & v[None, :]).astype(a.dtype)
        a = a * pair
        lap = jnp.diag(jnp.sum(a, axis=1)) - a
        kmask = (jnp.arange(e.shape[0]) < k).astype(a.dtype)
        e = e * kmask[:, None]
        lt_l = lap.T @ lap
        # full sum over the (k, k) matrix e Lt L e^T — NOT just its trace
        # (train_utils.py:138 sums every entry); padded e rows are zero.
        first = jnp.sum((e @ lt_l) @ e.T)
        proj = jnp.eye(n, dtype=a.dtype) - e.T @ e
        lbar = lap @ proj
        second = alpha * jnp.exp(-beta * jnp.trace(lbar.T @ lap))
        has_vecs = (k > 0).astype(a.dtype)
        return (first + second) * has_vecs

    return jnp.mean(jax.vmap(per_item)(a_theta, e_hat, e_count, valid))


def compute_losses(outputs: ModelOutputs, batch: Batch,
                   e_hat: jnp.ndarray | None = None,
                   e_count: jnp.ndarray | None = None) -> Dict[str, jnp.ndarray]:
    """All loss terms (train_func.py:172-256)."""
    valid = batch.person_valid
    a_hat = jax.vmap(gt_adjacency)(batch.social_group_id, valid)

    l_bce = adjacency_bce(outputs.a_theta, a_hat, valid)
    l_bce2 = adjacency_bce_weighted(outputs.a_theta, a_hat, valid)

    n_groups = jax.vmap(num_groups)(batch.social_group_id, valid)
    l_mse = jnp.mean((outputs.card[:, 0] - n_groups) ** 2)

    labels = partition_action_labels(batch.actions, valid)
    sg_labels = partition_action_labels(batch.social_group_activity, valid)

    l_pose = sum(ce_on_probs(outputs.pose[i], labels[i], valid) for i in range(3))
    l_inter = sum(masked_bce_mean(outputs.interaction[i], labels[3 + i],
                                  valid[..., None]) for i in range(4))
    l_act = l_pose + l_inter

    sg_l_pose = sum(masked_bce_mean(outputs.sg_pose[i], sg_labels[i],
                                    valid[..., None]) for i in range(3))
    sg_l_inter = sum(masked_bce_mean(outputs.sg_interaction[i], sg_labels[3 + i],
                                     valid[..., None]) for i in range(4))
    sg_l_act = sg_l_pose + sg_l_inter

    losses = {
        "L_bce": l_bce, "L_bce2": l_bce2, "L_mse": l_mse,
        "L_pose": l_pose, "L_interaction": l_inter, "L_act": l_act,
        "SG_L_pose": sg_l_pose, "SG_L_interaction": sg_l_inter,
        "SG_L_act": sg_l_act,
    }
    if e_hat is not None:
        losses["L_eig"] = eig_loss(outputs.a_theta, e_hat, e_count, valid)
        losses["L_g"] = l_bce + losses["L_eig"] + l_mse
    return losses


def total_loss(losses: Dict[str, jnp.ndarray], name: str) -> jnp.ndarray:
    """Loss selection (train_func.py:245-256)."""
    if name == "L_total":
        return losses["L_bce"] + losses["L_act"] + losses["SG_L_act"]
    if name == "L_g":
        return losses["L_g"]
    if name == "L_act":
        return losses["L_act"] + losses["SG_L_act"]
    return losses[name]
