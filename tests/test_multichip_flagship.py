"""Flagship-shape multichip agreement (VERDICT r3 item 10).

One data=8 train step at a mid-size config (100 actor slots, thousands of
sparse voxels) on the virtual CPU mesh must agree NUMERICALLY with the
single-device step on the same global batch. This pins the DP semantics of
the reference (nn.DataParallel, train_func.py:512): data parallelism is a
layout choice, not a math change — under GSPMD the jitted step over a
sharded batch computes the same program, and this test goes red if any
sharding annotation breaks that (per-shard batch statistics, a missing
mean, an fsdp split that changes a contraction).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_gar_tpu.config import MeshConfig
from multimodal_gar_tpu.models import MGAR
from multimodal_gar_tpu.parallel.mesh import (make_mesh, shard_batch,
                                              shard_train_state)
from multimodal_gar_tpu.train.train_state import (create_train_state,
                                                  make_train_step)
from multimodal_gar_tpu.utils.testing import synthetic_batch, tiny_config


def _midsize_config():
    """100 actors + real-shaped sparse stage caps, small frames (CPU budget)."""
    cfg = tiny_config(num_people=100, num_frames=3, image_hw=(96, 128),
                      max_voxels=2048)
    # grad_accum=1 so one step APPLIES the Adam update — agreement of the
    # updated parameters is the strongest check
    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_accum_steps=1))


@pytest.mark.slow
def test_data8_step_matches_single_device():
    assert jax.device_count() == 8
    cfg = _midsize_config()
    model = MGAR(cfg)
    per = synthetic_batch(cfg, batch_size=1, n_valid=100)
    batch8 = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * 8, axis=0), per)
    state, tx = create_train_state(cfg, model, per, jax.random.PRNGKey(0),
                                   cfg.train.stages[0], steps_per_epoch=8)
    step = jax.jit(make_train_step(model, tx, "L_total"))
    rng = jax.random.PRNGKey(3)

    # single-device reference step (batch 8 resident on device 0)
    ref_state, ref_metrics = step(state, batch8, rng)
    ref_loss = float(ref_metrics["loss"])
    assert np.isfinite(ref_loss)

    for mesh_cfg in (MeshConfig(data=8, fsdp=1), MeshConfig(data=4, fsdp=2)):
        mesh = make_mesh(mesh_cfg)
        st = shard_train_state(state, mesh)
        bt = shard_batch(batch8, mesh)
        new_state, metrics = step(st, bt, rng)
        loss = float(metrics["loss"])
        np.testing.assert_allclose(loss, ref_loss, rtol=2e-4,
                                   err_msg=f"loss mismatch at {mesh_cfg}")
        # updated parameters must match the single-device update
        ref_leaves = jax.tree_util.tree_leaves(ref_state.params)
        got_leaves = jax.tree_util.tree_leaves(new_state.params)
        assert len(ref_leaves) == len(got_leaves)
        worst = 0.0
        for a, b in zip(ref_leaves, got_leaves):
            d = float(jnp.max(jnp.abs(a - b)))
            worst = max(worst, d)
        # Adam deltas are O(lr)=1e-3; reduction-order noise must stay far below
        assert worst < 5e-5, (mesh_cfg, worst)
        # batch_stats (masked BN running stats) must agree too
        for a, b in zip(jax.tree_util.tree_leaves(ref_state.batch_stats),
                        jax.tree_util.tree_leaves(new_state.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-3)
