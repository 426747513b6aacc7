"""End-to-end miniature training run: synthetic on-disk JRDB -> run_training.

Exercises the full driver: pipeline, staged training, per-epoch JRDB eval,
orbax checkpointing, metric logging — on tiny CPU shapes.
"""
import dataclasses
import json
import os

import numpy as np
import pytest

from multimodal_gar_tpu.config import (Config, DataConfig, PointCloudConfig,
                                       PoolLayerConfig, StageConfig,
                                       TrainConfig, VoxelizationConfig)
from multimodal_gar_tpu.data.jrdb import JRDBActDataset
from multimodal_gar_tpu.data.synthetic import write_synthetic_jrdb
from multimodal_gar_tpu.train.loop import run_training


@pytest.fixture(scope="module")
def tiny_training_cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("jrdb"))
    write_synthetic_jrdb(root, num_seqs=1, frames_per_seq=3,
                         people_per_frame=4, image_hw=(48, 80))
    pc = PointCloudConfig(num_points=96, range=(-6.0, -6.0, -2.0, 6.0, 6.0, 3.0),
                          voxel=VoxelizationConfig((0.5, 0.5, 0.625), 5, 128, 128))
    data = DataConfig(root=root, image_size=(48, 80), num_frames=3,
                      num_boxes=6, point_cloud=pc)
    cfg = Config()
    cfg = dataclasses.replace(cfg, data=data)
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, lidar=dataclasses.replace(
            cfg.model.lidar, max_voxels_per_stage=(128, 128, 64, 32),
            grid_pool_size=2,
            pool_layers=(PoolLayerConfig("x_conv2", (8, 8), (1, 1, 1), 1.0, 4),
                         PoolLayerConfig("x_conv4", (8, 8), (1, 1, 1), 4.0, 4)))))
    cfg = dataclasses.replace(cfg, train=TrainConfig(
        batch_size=1, grad_accum_steps=1, log_every_steps=1,
        stages=(StageConfig(epochs=1, learning_rate=1e-3, loss="L_total"),
                StageConfig(epochs=0, learning_rate=3e-4, loss="L_total"))))
    return cfg


def test_cross_stage_param_persistence(tiny_training_cfg, tmp_path):
    """Stage 2 must start from stage 1's trained params with a FRESH
    optimizer (reference train_func.py:550-556 carries the model and only
    rebuilds Adam). Round-1 bug: create_train_state per stage re-initialised
    params from the rng."""
    import jax

    cfg = dataclasses.replace(tiny_training_cfg, train=dataclasses.replace(
        tiny_training_cfg.train,
        stages=(StageConfig(epochs=1, learning_rate=1e-3, loss="L_total"),
                StageConfig(epochs=1, learning_rate=3e-4, loss="L_total"))))
    snaps = {}
    run_training(cfg, str(tmp_path / "run2"), use_mesh=False,
                 max_steps_per_epoch=2, resume=False,
                 on_stage_start=lambda i, s: snaps.setdefault(("start", i), s),
                 on_stage_end=lambda i, s: snaps.setdefault(("end", i), s))
    end1, start2 = snaps[("end", 0)], snaps[("start", 1)]
    # params carried over exactly
    for a, b in zip(jax.tree_util.tree_leaves(end1.params),
                    jax.tree_util.tree_leaves(start2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ... and they are genuinely trained (differ from the fresh init)
    start1 = snaps[("start", 0)]
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(start1.params),
                        jax.tree_util.tree_leaves(start2.params)))
    assert changed
    # optimizer state is fresh: Adam moments all-zero at stage-2 start
    mu_leaves = [l for l in jax.tree_util.tree_leaves(start2.opt_state)
                 if hasattr(l, "shape") and l.ndim > 0]
    assert mu_leaves and all(np.allclose(np.asarray(l), 0.0)
                             for l in mu_leaves)
    # ... whereas stage-1's end optimizer had accumulated moments
    end_mu = [l for l in jax.tree_util.tree_leaves(end1.opt_state)
              if hasattr(l, "shape") and l.ndim > 0]
    assert any(not np.allclose(np.asarray(l), 0.0) for l in end_mu)


def test_run_training_end_to_end(tiny_training_cfg, tmp_path):
    workdir = str(tmp_path / "run")
    metrics = run_training(tiny_training_cfg, workdir, use_mesh=False,
                           max_steps_per_epoch=2)
    # eval metrics produced
    for key in ("overall_AP", "action_AP", "activity_AP", "score"):
        assert key in metrics, key
        assert np.isfinite(metrics[key])
    # artifacts on disk: metric log, checkpoints, result files
    assert os.path.exists(os.path.join(workdir, "logs", "metrics.jsonl"))
    lines = open(os.path.join(workdir, "logs", "metrics.jsonl")).read().splitlines()
    assert any('"train/loss"' in l for l in lines)
    assert any('"val/overall_AP"' in l for l in lines)
    assert os.path.exists(os.path.join(workdir, "checkpoints", "best.json"))
    results = os.path.join(workdir, "results", "s0_e0")
    assert os.path.exists(os.path.join(results, "grouping.txt"))
    assert os.path.exists(os.path.join(results, "action.txt"))
