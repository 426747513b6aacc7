"""Detector overfit test: the zoo can actually learn, not just run.

Same philosophy as tests/test_overfit.py for the flagship model (VERDICT r2
weak #4): train SECOND on one fixed synthetic scene until the RPN loss
collapses and the top detection lands on a ground-truth box. A red test on
any gradient-flow regression through the anchor head / BEV trunk / sparse
backbone stack.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_gar_tpu.detection.detectors import build_detector
from multimodal_gar_tpu.detection.train import (create_det_train_state,
                                                make_det_train_step)
from tests.test_detection import det_batch, tiny_voxel_cfg


@pytest.mark.slow
def test_second_overfits_fixed_scene():
    cfg = tiny_voxel_cfg("SECOND")
    model = build_detector("SECOND", cfg)
    batch = det_batch(cfg, m=64, g=3, seed=3)

    state, tx = create_det_train_state(model, batch, jax.random.PRNGKey(0))
    step = jax.jit(make_det_train_step(model, tx))
    rng = jax.random.PRNGKey(1)

    first = None
    last = None
    for i in range(200):
        state, metrics = step(state, batch, rng)
        if i == 0:
            first = float(metrics["loss"])
        last = float(metrics["loss"])
    assert np.isfinite(last), last
    assert last < first / 5.0, (first, last)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    preds = jax.jit(lambda v, b: model.apply(v, b, train=False))(
        variables, batch)
    out = jax.jit(model.predict)(preds)
    # the top-scoring detection lies near SOME valid GT center (BEV)
    top = int(jnp.argmax(out["scores"][0]))
    box = np.asarray(out["boxes"][0, top, :2])
    gt = np.asarray(batch.gt_boxes[0, np.asarray(batch.gt_valid[0]), :2])
    d = np.linalg.norm(gt - box[None], axis=1).min()
    assert d < 2.0, (d, box, gt)
    assert float(out["scores"][0, top]) > 0.3
