"""Does-it-actually-learn test: overfit the full MGAR on a fixed tiny set.

With real JRDB data unavailable in this image, driving the training
objective (reference train_func.py:172-269) to convergence on a fixed
synthetic set is the strongest obtainable end-to-end signal that gradients
flow correctly through every module: any broken gradient path (stopped
gradient, masked-out loss term, detached head) shows up as a failure to
overfit. Asserts BOTH the VERDICT round-2 criteria: grouping AP == 1.0 on
the train set and >= 10x total-loss reduction.
"""
import dataclasses

import jax
import numpy as np
import pytest

from multimodal_gar_tpu.eval.ap import set_detection_ap
from multimodal_gar_tpu.models import MGAR
from multimodal_gar_tpu.ops.grouping import decode_group_ids
from multimodal_gar_tpu.train.train_state import (create_train_state,
                                                  make_eval_step,
                                                  make_train_step)
from tests.util import synthetic_batch, tiny_config


def _learnable_batch(cfg):
    """Fixed 2-clip set whose labels are CONSISTENT with the inputs.

    synthetic_batch's labels are random (groups uncorrelated with geometry,
    multi-hot actions with conflicting partition targets), which puts an
    irreducible floor under several loss terms. Overfitting tests gradient
    FLOW, so the fixture must be fittable: two spatially-separated groups
    (2D boxes overlap within a group, never across; 3D centers clustered),
    and one action class per actor so every partition target is exact.
    """
    import jax.numpy as jnp

    base = synthetic_batch(cfg, batch_size=2)
    valid = np.asarray(base.person_valid)
    b, n = valid.shape
    h, w = cfg.data.image_size
    rng = np.random.default_rng(42)

    sgid = np.full((b, n), -1, np.int32)
    boxes2d = np.zeros((b, n, 4), np.float32)
    boxes3d = np.asarray(base.boxes3d).copy()
    actions = np.zeros((b, n, 27), np.float32)
    centers2d = [(w * 0.2, h * 0.5), (w * 0.8, h * 0.5)]
    centers3d = [(-4.0, -4.0), (4.0, 4.0)]
    for bi in range(b):
        for i in np.flatnonzero(valid[bi]):
            g = int(i % 2)
            cx, cy = centers2d[g]
            jx, jy = rng.uniform(-3, 3, 2)
            boxes2d[bi, i] = [cx + jx - 8, cy + jy - 12,
                              cx + jx + 8, cy + jy + 12]
            boxes3d[bi, i, 0:2] = np.asarray(centers3d[g]) \
                + rng.uniform(-0.4, 0.4, 2)
            boxes3d[bi, i, 2] = 0.0
            sgid[bi, i] = g
            actions[bi, i, int(i % 3)] = 1.0      # one pose-1 class each
    return base.replace(
        boxes2d=jnp.asarray(boxes2d), boxes3d=jnp.asarray(boxes3d),
        social_group_id=jnp.asarray(sgid), actions=jnp.asarray(actions),
        social_group_activity=jnp.asarray(actions))


@pytest.mark.slow
def test_overfit_fixed_set_group_ap_and_loss():
    cfg = tiny_config()
    # single-step optimizer updates, overfit-friendly LR, no LR decay
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, grad_accum_steps=1, lr_decay_gamma=1.0))
    stage = dataclasses.replace(cfg.train.stages[0], learning_rate=2e-3)

    batch = _learnable_batch(cfg)                   # THE fixed train set
    model = MGAR(cfg)
    state, tx = create_train_state(cfg, model, batch, jax.random.PRNGKey(0),
                                   stage, steps_per_epoch=1000)
    step = jax.jit(make_train_step(model, tx, "L_total"))
    eval_step = jax.jit(make_eval_step(model))

    from multimodal_gar_tpu.train.losses import compute_losses, total_loss

    @jax.jit
    def eval_loss(state, batch):
        # deterministic loss: train-mode loss carries a Dropout(0.2) noise
        # floor, so the 10x criterion is judged on the eval-mode forward
        out = eval_step(state, batch)
        return total_loss(compute_losses(out, batch), "L_total")

    rng = jax.random.PRNGKey(1)
    loss0 = float(eval_loss(state, batch))
    loss = loss0
    for i in range(800):
        state, metrics = step(state, batch, rng)
        assert np.isfinite(float(metrics["loss"])), f"non-finite at {i}"
        if i % 50 == 49:
            loss = float(eval_loss(state, batch))
            if loss <= loss0 / 10 and i >= 100:
                break

    assert loss <= loss0 / 10, (
        f"eval loss only {loss0:.4f} -> {loss:.4f} after overfitting; "
        "a gradient path is broken or a loss term is saturated")

    # grouping AP on the train set must be perfect
    out = eval_step(state, batch)
    a_theta = np.asarray(out.a_theta)
    valid = np.asarray(batch.person_valid)
    boxes2d = np.asarray(batch.boxes2d)
    gt_gid = np.asarray(batch.social_group_id)

    dets, gts = [], []
    for b in range(valid.shape[0]):
        v = valid[b]
        pred = np.asarray(decode_group_ids(out.a_theta[b],
                                           batch.person_valid[b]))
        for g in np.unique(pred[v]):
            members = boxes2d[b][(pred == g) & v]
            dets.append((b, members, 1.0))
        for g in np.unique(gt_gid[b][v & (gt_gid[b] >= 0)]):
            gts.append((b, boxes2d[b][(gt_gid[b] == g) & v]))
    ap = set_detection_ap(dets, gts)
    assert ap == pytest.approx(1.0, abs=1e-6), (
        f"train-set grouping AP {ap} != 1.0 after overfitting")
