"""The training driver: staged training + per-epoch JRDB eval + best ckpt.

Capability parity with reference train_func.py:67-557 (train_net + the
module-level driver): two-stage Adam training, per-epoch evaluation through
the JRDB-Act AP harness, best-checkpoint selection on
activity_AP * grouping_AP (grouping_AP alone for the L_bce stage,
train_func.py:317-320), all metric logging — TPU-native: one jitted train
step over a device mesh, orbax checkpoints, pluggable metric writer.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import Config
from ..data.jrdb import JRDBActDataset
from ..data.pipeline import DataPipeline
from ..eval.evaluator import evaluate_epoch
from ..models import MGAR
from ..parallel.mesh import make_mesh, shard_batch, shard_train_state
from ..types import Batch
from ..utils.metrics import MetricWriter, Timer
from .checkpoint import CheckpointManager
from .train_state import (TrainState, create_train_state, make_eval_step,
                          make_optimizer, make_train_step)


def run_training(cfg: Config, workdir: str,
                 train_ds: Optional[JRDBActDataset] = None,
                 val_ds: Optional[JRDBActDataset] = None,
                 use_mesh: bool = True,
                 max_steps_per_epoch: Optional[int] = None,
                 resume: bool = True,
                 on_stage_start: Optional[Callable[[int, TrainState], None]] = None,
                 on_stage_end: Optional[Callable[[int, TrainState], None]] = None
                 ) -> Dict[str, float]:
    """Run all configured stages; returns the final eval metrics.

    ``resume=True`` restores the latest orbax checkpoint in the workdir (if
    any) into the first trained stage — preemption-safe training (SURVEY.md
    §5.3/5.4; the reference's resume path was commented out, train_func.py:517).
    """
    caps = cfg.model.lidar.max_voxels_per_stage
    train_ds = train_ds or JRDBActDataset(cfg.data, "train", training=True,
                                          rulebook_caps=caps)
    val_ds = val_ds or JRDBActDataset(cfg.data, "test", training=False,
                                      rulebook_caps=caps)

    any_eig = any(stage.loss == "L_g" for stage in cfg.train.stages)
    train_pipe = DataPipeline(train_ds, cfg.train.batch_size,
                              shuffle=cfg.train.shuffle, seed=cfg.train.seed,
                              with_eig=any_eig,
                              num_workers=cfg.train.num_workers)
    # drop_last=False + in-pipeline padding: the remainder batch is padded to
    # the full batch shape, so eval compiles exactly ONE program
    val_pipe = DataPipeline(val_ds, cfg.train.batch_size, shuffle=False,
                            drop_last=False,
                            num_workers=cfg.train.num_workers)

    mesh = make_mesh(cfg.mesh) if use_mesh and jax.device_count() > 1 else None
    writer = MetricWriter(os.path.join(workdir, "logs"))
    ckpt = CheckpointManager(os.path.join(workdir, "checkpoints"))
    timer = Timer()

    model = MGAR(cfg)
    rng = jax.random.PRNGKey(cfg.train.seed)
    init_batch = next(iter(train_pipe.epoch(0)))
    steps_per_epoch = train_pipe.steps_per_epoch()
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)

    metrics: Dict[str, float] = {}
    global_step = 0
    restored = False
    params = None            # carried across stages (train_func.py:550-556:
    batch_stats = None       # the reference keeps the trained model and only
    for stage_idx, stage in enumerate(cfg.train.stages):  # rebuilds Adam)
        if stage.epochs <= 0:
            continue
        if params is None:
            state, tx = create_train_state(cfg, model, init_batch, rng, stage,
                                           steps_per_epoch)
        else:
            tx = make_optimizer(stage, steps_per_epoch,
                                cfg.train.grad_accum_steps,
                                cfg.train.lr_decay_gamma)
            state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                               batch_stats=batch_stats,
                               opt_state=tx.init(params))
        if resume and not restored and ckpt.latest_step() is not None:
            state = ckpt.restore(state)
            global_step = int(state.step)
            print(f"resumed from checkpoint at step {global_step}", flush=True)
            restored = True
        if mesh is not None:
            state = shard_train_state(state, mesh)
        if on_stage_start is not None:
            on_stage_start(stage_idx, state)
        needs_eig = stage.loss == "L_g"
        train_step = jax.jit(make_train_step(model, tx, stage.loss,
                                             needs_eig=needs_eig))
        eval_step = jax.jit(make_eval_step(model))

        # fast-forward past already-trained epochs after a resume. The
        # restored global step counts epochs across ALL prior stages, so
        # subtract the epochs belonging to stages before this one — gating
        # on stage 0 alone would re-train a later stage's completed epochs
        # (double-training restored weights and shifting the LR schedule).
        start_epoch = 0
        if restored:
            done_epochs = global_step // max(steps_per_epoch, 1)
            prior_epochs = sum(s.epochs for s in cfg.train.stages[:stage_idx]
                               if s.epochs > 0)
            start_epoch = max(0, min(done_epochs - prior_epochs,
                                     stage.epochs))
        for epoch in range(start_epoch, stage.epochs):
            for i, batch in enumerate(train_pipe.epoch(epoch)):
                if max_steps_per_epoch and i >= max_steps_per_epoch:
                    break
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
                if needs_eig:
                    # eig inputs are precomputed in the pipeline's producer
                    # thread (DataPipeline(with_eig=True))
                    state, step_metrics = train_step(
                        state, batch, rng,
                        e_hat=batch.e_hat, e_count=batch.e_count)
                else:
                    state, step_metrics = train_step(state, batch, rng)
                global_step += 1
                if global_step % cfg.train.log_every_steps == 0:
                    writer.write(global_step,
                                 {k: float(v) for k, v in step_metrics.items()},
                                 prefix="train/")

            if (epoch + 1) % cfg.train.eval_every_epochs == 0:
                metrics = evaluate_epoch(
                    lambda b: eval_step(state, b), val_pipe.epoch(0),
                    result_dir=os.path.join(workdir, "results",
                                            f"s{stage_idx}_e{epoch}"))
                # best-score rule (train_func.py:317-320)
                if stage.loss == "L_bce":
                    score = metrics["overall_AP"]
                else:
                    score = metrics["activity_AP"] * metrics["overall_AP"]
                metrics["score"] = score
                writer.write(global_step, metrics, prefix="val/")
                ckpt.save(global_step, state, metrics)
            print(f"stage {stage_idx} epoch {epoch} done "
                  f"({timer.epochtime():.1f}s)", flush=True)

        params, batch_stats = state.params, state.batch_stats
        if on_stage_end is not None:
            on_stage_end(stage_idx, state)

    writer.close()
    ckpt.close()
    train_pipe.close()
    val_pipe.close()
    return metrics
