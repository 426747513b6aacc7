"""End-to-end forward smoke tests for the full MGAR model (tiny shapes)."""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_gar_tpu.models import MGAR
from tests.util import synthetic_batch, tiny_config


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = tiny_config()
    batch = synthetic_batch(cfg, batch_size=2)
    model = MGAR(cfg)
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(0), batch)
    apply_eval = jax.jit(partial(model.apply, train=False))
    return cfg, model, variables, batch, apply_eval


def test_forward_shapes(model_and_vars):
    cfg, model, variables, batch, apply_eval = model_and_vars
    out = apply_eval(variables, batch)
    n = cfg.data.num_boxes
    b = batch.images.shape[0]
    assert out.a_theta.shape == (b, n, n)
    assert [p.shape for p in out.pose] == [(b, n, 4)] * 3
    assert [p.shape[-1] for p in out.interaction] == [2, 4, 7, 5]
    assert [p.shape[-1] for p in out.sg_interaction] == [2, 4, 7, 5]
    assert out.card.shape == (b, 1)
    assert out.group_ids.shape == (b, n)


def test_forward_finite_and_masked(model_and_vars):
    cfg, model, variables, batch, apply_eval = model_and_vars
    out = apply_eval(variables, batch)
    for leaf in jax.tree_util.tree_leaves(out):
        assert np.all(np.isfinite(np.asarray(leaf, dtype=np.float32)))
    # padded actors produce zero outputs
    invalid = ~np.asarray(batch.person_valid)
    assert np.allclose(np.asarray(out.pose[0])[invalid], 0)
    assert np.allclose(np.asarray(out.a_theta)[invalid], 0)


def test_eval_diagonal_filled(model_and_vars):
    cfg, model, variables, batch, apply_eval = model_and_vars
    out = apply_eval(variables, batch)
    a = np.asarray(out.a_theta)
    valid = np.asarray(batch.person_valid)
    for b in range(a.shape[0]):
        d = np.diag(a[b])
        assert np.allclose(d[valid[b]], 1.0)
        assert np.allclose(d[~valid[b]], 0.0)


def test_train_mode_runs_with_mutable_stats(model_and_vars):
    cfg, model, variables, batch, apply_eval = model_and_vars
    from functools import partial
    apply_train = jax.jit(partial(model.apply, train=True, mutable=["batch_stats"]))
    out, updates = apply_train(
        variables, batch, rngs={"dropout": jax.random.PRNGKey(1)})
    assert "batch_stats" in updates
    for leaf in jax.tree_util.tree_leaves(out):
        assert np.all(np.isfinite(np.asarray(leaf, dtype=np.float32)))
