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


@pytest.mark.slow
def test_overfit_fixed_set_group_ap_and_loss():
    cfg = tiny_config()
    # single-step optimizer updates, overfit-friendly LR, no LR decay
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, grad_accum_steps=1, lr_decay_gamma=1.0))
    stage = dataclasses.replace(cfg.train.stages[0], learning_rate=2e-3)

    batch = synthetic_batch(cfg, batch_size=2)      # THE fixed train set
    model = MGAR(cfg)
    state, tx = create_train_state(cfg, model, batch, jax.random.PRNGKey(0),
                                   stage, steps_per_epoch=1000)
    step = jax.jit(make_train_step(model, tx, "L_total"))
    eval_step = jax.jit(make_eval_step(model))

    rng = jax.random.PRNGKey(1)
    loss0 = None
    loss = None
    for i in range(400):
        state, metrics = step(state, batch, rng)
        loss = float(metrics["loss"])
        assert np.isfinite(loss), f"non-finite loss at step {i}"
        if loss0 is None:
            loss0 = loss
        if loss <= loss0 / 10 and i >= 50:
            break

    assert loss is not None and loss <= loss0 / 10, (
        f"loss only {loss0:.4f} -> {loss:.4f} after overfitting; "
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
