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
    # exact grid-pool neighbor selection: approx_max_k (the perf default)
    # compiles a shape-dependent selection network, so the per-shard batch
    # shape can pick a DIFFERENT near-tied neighbor than the batch-8
    # single-device program — a discrete gather change that moves a few
    # params by a full Adam step (measured worst 2.0e-3 vs the 5e-5 bar)
    # while the loss still agrees to 2e-4. DP-as-pure-layout only holds for
    # partition-invariant programs; this test pins THAT contract.
    lidar = dataclasses.replace(cfg.model.lidar, pool_approx_nsample=False)
    # grad_accum=1 so one step APPLIES the Adam update — agreement of the
    # updated parameters is the strongest check
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, lidar=lidar),
        train=dataclasses.replace(cfg.train, grad_accum_steps=1))


def _adam_mu(opt_state):
    """The ScaleByAdamState.mu pytree inside an optax.adam (chain) state."""
    for s in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: hasattr(x, "mu")):
        if hasattr(s, "mu"):
            return s.mu
    raise AssertionError("no ScaleByAdamState in opt_state")


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

        # GRADIENT agreement via Adam's first moment: after one step from a
        # zero-initialized optimizer, mu = (1-b1)*g — LINEAR in the gradient.
        # This is the real "DP is a layout choice, not a math change" check:
        # the sharded program's psum over per-shard partial sums must
        # reproduce the single-device batch reduction up to reduction-order
        # noise. (Comparing post-Adam params instead is ill-posed: at step 1
        # the update is lr*sign(g) for ANY nonzero g, so an eps-level
        # difference in a numerically-tiny gradient flips the whole +/-lr
        # step — measured worst exactly 2*lr with bit-identical inputs,
        # fresh same-machine compile caches, and exact neighbor selection.)
        ref_mu = _adam_mu(ref_state.opt_state)
        got_mu = _adam_mu(new_state.opt_state)
        ref_mu_leaves = jax.tree_util.tree_leaves(ref_mu)
        got_mu_leaves = jax.tree_util.tree_leaves(got_mu)
        assert ref_mu_leaves and len(ref_mu_leaves) == len(got_mu_leaves)
        # atol: mu-noise floor. Measured on this host: the largest absolute
        # mu disagreement is ~1e-6 (one noise-level component of 512 in one
        # leaf); 3e-6 gives 3x margin while staying 30x below the 1e-4
        # meaningful-gradient threshold the param check keys off.
        for a, b in zip(ref_mu_leaves, got_mu_leaves):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=3e-6,
                err_msg=f"gradient (adam mu) mismatch at {mesh_cfg}")

        # Updated params must match tightly wherever the gradient is
        # numerically meaningful (|mu| = 0.1|g| > 1e-5, i.e. |g| > 1e-4 —
        # three decades above reduction noise, so sign flips are impossible
        # there), and everywhere the update stays bounded by one Adam step
        # per side (no runaway divergence).
        worst_meaningful = 0.0
        worst_any = 0.0
        for a, b, m in zip(jax.tree_util.tree_leaves(ref_state.params),
                           jax.tree_util.tree_leaves(new_state.params),
                           ref_mu_leaves):
            d = np.abs(np.asarray(a) - np.asarray(b))
            worst_any = max(worst_any, float(d.max(initial=0.0)))
            mask = np.abs(np.asarray(m)) > 1e-5
            if mask.any():
                worst_meaningful = max(worst_meaningful, float(d[mask].max()))
        assert worst_meaningful < 5e-5, (mesh_cfg, worst_meaningful)
        assert worst_any < 2.5e-3, (mesh_cfg, worst_any)

        # batch_stats (masked BN running stats) must agree too
        for a, b in zip(jax.tree_util.tree_leaves(ref_state.batch_stats),
                        jax.tree_util.tree_leaves(new_state.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-3)
