"""CLI: python -m multimodal_gar_tpu train --config cfg.yaml --workdir out/

Replaces the reference's script-body entry point (train_func.py has no main();
config path, dataset root and toolkit paths are hardcoded absolute paths —
here everything is injected via config/flags).
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(prog="multimodal_gar_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_train = sub.add_parser("train", help="run staged training + eval")
    p_train.add_argument("--config", default=None, help="YAML config path")
    p_train.add_argument("--workdir", required=True)
    p_train.add_argument("--set", action="append", default=[],
                         help="dotted config override, e.g. train.batch_size=2")
    p_train.add_argument("--max-steps-per-epoch", type=int, default=None)

    p_eval = sub.add_parser("eval", help="evaluate a checkpoint")
    p_eval.add_argument("--config", default=None)
    p_eval.add_argument("--workdir", required=True)
    p_eval.add_argument("--set", action="append", default=[])

    args = parser.parse_args(argv)

    from .config import load_config
    cfg = load_config(args.config, overrides=args.set)

    if args.cmd == "train":
        from .train.loop import run_training
        metrics = run_training(cfg, args.workdir,
                               max_steps_per_epoch=args.max_steps_per_epoch)
        print("final:", metrics)
    elif args.cmd == "eval":
        import jax

        from .data.jrdb import JRDBActDataset
        from .data.pipeline import DataPipeline
        from .eval.evaluator import evaluate_epoch
        from .models import MGAR
        from .train.checkpoint import CheckpointManager
        from .train.train_state import create_train_state, make_eval_step

        val_ds = JRDBActDataset(cfg.data, "test", training=False,
                                rulebook_caps=cfg.model.lidar.max_voxels_per_stage)
        pipe = DataPipeline(val_ds, cfg.train.batch_size, shuffle=False,
                            drop_last=False)
        model = MGAR(cfg)
        init_batch = next(iter(pipe.epoch(0)))
        state, _ = create_train_state(cfg, model, init_batch,
                                      jax.random.PRNGKey(0),
                                      cfg.train.stages[0], 1)
        ckpt = CheckpointManager(f"{args.workdir}/checkpoints")
        state = ckpt.restore(state)
        eval_step = jax.jit(make_eval_step(model))
        metrics = evaluate_epoch(lambda b: eval_step(state, b), pipe.epoch(0),
                                 result_dir=f"{args.workdir}/results/eval")
        print("eval:", metrics)
    return 0


if __name__ == "__main__":
    sys.exit(main())
