"""Training driver for the detector zoo: optimizer, jitted step, sharding.

Capability parity with the pcdet training entry the reference vendors but
never drives (pcdet train utilities referenced from SURVEY.md §2.7): one
jit-compiled train step per detector with Adam(+clip) and optional
data-parallel sharding over a jax Mesh — the same mesh machinery the MGAR
path uses (parallel/mesh.py), so the zoo scales out identically.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from .detectors import DetBatch


@flax.struct.dataclass
class DetTrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_det_train_state(model, batch: DetBatch, rng: jax.Array,
                           learning_rate: float = 3e-3,
                           weight_decay: float = 0.01,
                           clip_norm: float = 10.0,
                           needs_sampler: bool = False
                           ) -> Tuple[DetTrainState, optax.GradientTransformation]:
    rngs = {"params": rng}
    if needs_sampler:
        rngs["sampler"] = jax.random.fold_in(rng, 1)
    variables = jax.jit(
        partial(model.init, train=False))(rngs if needs_sampler else rng,
                                          batch)
    tx = optax.chain(optax.clip_by_global_norm(clip_norm),
                     optax.adamw(learning_rate, weight_decay=weight_decay))
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    return DetTrainState(step=jnp.zeros((), jnp.int32), params=params,
                         batch_stats=stats, opt_state=tx.init(params)), tx


def make_det_train_step(model, tx, needs_sampler: bool = False):
    """One fused forward+loss+grad+update step for any zoo detector."""

    def step_fn(state: DetTrainState, batch: DetBatch, rng: jax.Array
                ) -> Tuple[DetTrainState, Dict[str, jnp.ndarray]]:
        rng = jax.random.fold_in(rng, state.step)
        rngs = {"dropout": rng}
        if needs_sampler:
            rngs["sampler"] = jax.random.fold_in(rng, 7)

        def loss_fn(params):
            preds, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, rngs=rngs, mutable=["batch_stats"])
            losses = model.loss(preds, batch)
            return losses["loss"], (losses, updates["batch_stats"])

        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g))
             for g in jax.tree_util.tree_leaves(grads)]))
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["nonfinite_grads"] = 1.0 - finite.astype(jnp.float32)
        return DetTrainState(step=state.step + 1, params=new_params,
                             batch_stats=new_stats, opt_state=new_opt), \
            metrics

    return step_fn


def shard_det_batch(batch: DetBatch, mesh) -> DetBatch:
    """Shard the batch axis over the mesh's 'data' axis — the same
    NamedSharding rule the MGAR path uses (parallel/mesh.py:45-48)."""
    from ..parallel.mesh import shard_batch
    return shard_batch(batch, mesh)
