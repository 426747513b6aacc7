"""Train state: optimizer, LR schedule, gradient accumulation, jitted steps.

TPU-native replacement for the reference driver machinery:
  - Adam + 0.9^epoch LambdaLR (train_func.py:88-92, 552) -> optax.adam with a
    staircase exponential schedule.
  - 8-iteration gradient accumulation (train_func.py:262-269) ->
    optax.MultiSteps (identical average-gradient semantics).
  - nn.DataParallel (train_func.py:512) -> one jit-compiled step sharded over a
    jax.sharding.Mesh (see parallel/mesh.py).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from ..config import Config, StageConfig
from ..models import MGAR
from ..types import Batch, ModelOutputs
from .losses import compute_losses, total_loss


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(stage: StageConfig, steps_per_epoch: int,
                   grad_accum: int, gamma: float) -> optax.GradientTransformation:
    """Adam with per-epoch 0.9^epoch decay and k-step gradient accumulation."""
    schedule = optax.exponential_decay(
        init_value=stage.learning_rate,
        transition_steps=max(steps_per_epoch // max(grad_accum, 1), 1),
        decay_rate=gamma, staircase=True)
    tx = optax.adam(learning_rate=schedule)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def create_train_state(cfg: Config, model: MGAR, batch: Batch,
                       rng: jax.Array, stage: StageConfig,
                       steps_per_epoch: int) -> Tuple[TrainState, optax.GradientTransformation]:
    variables = jax.jit(functools.partial(model.init, train=False))(rng, batch)
    ckpt_path = getattr(cfg.model.rgb, "i3d_checkpoint", None)
    if ckpt_path:
        from ..models.i3d_convert import load_i3d_checkpoint
        variables = load_i3d_checkpoint(variables, ckpt_path,
                                        scope="rgb_backbone")
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict({}))
    tx = make_optimizer(stage, steps_per_epoch, cfg.train.grad_accum_steps,
                        cfg.train.lr_decay_gamma)
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state), tx


def make_train_step(model: MGAR, tx: optax.GradientTransformation,
                    loss_name: str, needs_eig: bool = False):
    """One jit-able training step: forward, all losses, grad, update.

    Robustness guard (TPU-native analogue of the reference's NaN skip-lists,
    train_func.py:155-160): non-finite gradients are zeroed rather than
    applied, and the event is surfaced in metrics["nonfinite_grads"].
    """

    def step_fn(state: TrainState, batch: Batch, dropout_rng: jax.Array,
                e_hat: jnp.ndarray | None = None,
                e_count: jnp.ndarray | None = None
                ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng = jax.random.fold_in(dropout_rng, state.step)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, rngs={"dropout": rng},
                mutable=["batch_stats"])
            losses = compute_losses(out, batch,
                                    e_hat=e_hat if needs_eig else None,
                                    e_count=e_count if needs_eig else None)
            loss = total_loss(losses, loss_name)
            return loss, (losses, updates["batch_stats"])

        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]))
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt_state)
        metrics = dict(losses)
        metrics["loss"] = loss
        metrics["nonfinite_grads"] = 1.0 - finite.astype(jnp.float32)
        return new_state, metrics

    return step_fn


def make_eval_step(model: MGAR):
    def eval_fn(state: TrainState, batch: Batch) -> ModelOutputs:
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False)
    return eval_fn
