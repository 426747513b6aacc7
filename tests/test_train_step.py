"""Training-step tests: loss decreases, grad accumulation, mesh sharding."""
import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_gar_tpu.models import MGAR
from multimodal_gar_tpu.parallel.mesh import (make_mesh, shard_batch,
                                              shard_train_state)
from multimodal_gar_tpu.config import MeshConfig
from multimodal_gar_tpu.train.train_state import (create_train_state,
                                                  make_eval_step,
                                                  make_train_step)
from tests.util import synthetic_batch, tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_accum_steps=2))
    batch = synthetic_batch(cfg, batch_size=2)
    model = MGAR(cfg)
    state, tx = create_train_state(
        cfg, model, batch, jax.random.PRNGKey(0),
        cfg.train.stages[0], steps_per_epoch=4)
    return cfg, model, state, tx, batch


def test_train_step_decreases_loss(setup):
    cfg, model, state, tx, batch = setup
    step = jax.jit(make_train_step(model, tx, "L_total"))
    rng = jax.random.PRNGKey(1)
    first = None
    for i in range(8):
        state, metrics = step(state, batch, rng)
        loss = float(metrics["loss"])
        assert np.isfinite(loss)
        if first is None:
            first = loss
    assert float(metrics["loss"]) < first


def test_metrics_contain_all_terms(setup):
    cfg, model, state, tx, batch = setup
    step = jax.jit(make_train_step(model, tx, "L_total"))
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    for key in ["L_bce", "L_bce2", "L_mse", "L_pose", "L_interaction",
                "SG_L_act", "loss"]:
        assert key in metrics and np.isfinite(float(metrics[key]))


def test_grad_accum_updates_every_k(setup):
    cfg, model, state, tx, batch = setup
    step = jax.jit(make_train_step(model, tx, "L_total"))
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    state1, _ = step(state, batch, jax.random.PRNGKey(1))
    # after 1 of 2 accumulation steps params must be unchanged
    p1 = jax.tree_util.tree_leaves(state1.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    state2, _ = step(state1, batch, jax.random.PRNGKey(1))
    p2 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p2))


def test_mesh_sharded_train_step(setup):
    """The full train step jits and runs with the batch sharded over an
    8-device data mesh (virtual CPU devices)."""
    cfg, model, state, tx, batch = setup
    assert jax.device_count() == 8
    mesh = make_mesh(MeshConfig(data=8, fsdp=1))
    big = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * 4, axis=0), batch)   # batch of 8
    big = shard_batch(big, mesh)
    state_sh = shard_train_state(state, mesh)
    step = jax.jit(make_train_step(model, tx, "L_total"))
    new_state, metrics = step(state_sh, big, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_eval_step(setup):
    cfg, model, state, tx, batch = setup
    ev = jax.jit(make_eval_step(model))
    out = ev(state, batch)
    assert out.a_theta.shape[0] == 2


def test_nonfinite_grad_guard(setup):
    """A poisoned batch (NaN images) must not corrupt the parameters."""
    import jax.numpy as jnp
    cfg, model, state, tx, batch = setup
    step = jax.jit(make_train_step(model, tx, "L_total"))
    bad = batch.replace(images=batch.images * jnp.nan)
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    s1, m1 = step(state, bad, jax.random.PRNGKey(0))
    s2, m2 = step(s1, bad, jax.random.PRNGKey(0))   # complete the accum cycle
    assert float(m1["nonfinite_grads"]) == 1.0
    p2 = np.asarray(jax.tree_util.tree_leaves(s2.params)[0])
    assert np.isfinite(p2).all()
    np.testing.assert_array_equal(p0, p2)           # zeroed grads -> no change


def test_multihost_utils_single_process():
    from multimodal_gar_tpu.parallel.multihost import (merge_eval_records,
                                                       reduce_metrics_mean)
    recs = [("a", 1), ("b", 2)]
    assert merge_eval_records(recs) == recs
    assert reduce_metrics_mean({"x": 1.0}) == {"x": 1.0}
