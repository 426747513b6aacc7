"""Detector-zoo training driver: fused step, loss decrease, 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_gar_tpu.config import MeshConfig
from multimodal_gar_tpu.detection import build_detector
from multimodal_gar_tpu.detection.train import (create_det_train_state,
                                                make_det_train_step,
                                                shard_det_batch)
from multimodal_gar_tpu.parallel.mesh import make_mesh, shard_train_state
from tests.test_detection import det_batch, tiny_voxel_cfg


def test_det_train_step_reduces_loss():
    cfg = tiny_voxel_cfg("SECOND")
    model = build_detector("SECOND", cfg)
    batch = det_batch(cfg)
    state, tx = create_det_train_state(model, batch, jax.random.PRNGKey(0),
                                       learning_rate=1e-3)
    step = jax.jit(make_det_train_step(model, tx))
    rng = jax.random.PRNGKey(1)
    state, m0 = step(state, batch, rng)
    for _ in range(4):
        state, m = step(state, batch, rng)
    assert int(state.step) == 5
    assert jnp.isfinite(m["loss"])
    assert float(m["loss"]) < float(m0["loss"])
    assert float(m["nonfinite_grads"]) == 0.0


def test_det_train_step_sharded_8dev():
    assert jax.device_count() >= 8
    cfg = tiny_voxel_cfg("SECOND")
    model = build_detector("SECOND", cfg)
    per_dev = det_batch(cfg)
    batch = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * 8, axis=0), per_dev)
    mesh = make_mesh(MeshConfig(data=8, fsdp=1))
    state, tx = create_det_train_state(model, per_dev, jax.random.PRNGKey(0))
    state = shard_train_state(state, mesh)
    batch = shard_det_batch(batch, mesh)
    step = jax.jit(make_det_train_step(model, tx))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert jnp.isfinite(metrics["loss"])
