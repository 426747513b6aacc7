"""Checkpoint / resume via orbax.

Capability parity with the reference's checkpoint story (SURVEY.md §5.4):
torch.save of {"model", "epoch", "overall_AP", "Loss"} on best score
(train_func.py:323-329), per-epoch saves (:475), and pcdet's
load_params_{from_file,with_optimizer} (detector3d_template.py:361-415) —
replaced by orbax checkpoints of the FULL train state (params + optimizer +
batch stats + step; the reference loses optimizer state) with a best-metric
pointer file and automatic garbage collection.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))
        self._best_path = os.path.join(self.directory, "best.json")

    def save(self, step: int, state: Any,
             metrics: Optional[dict] = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        if metrics:
            self._maybe_update_best(step, metrics)

    def _maybe_update_best(self, step: int, metrics: dict) -> None:
        score = metrics.get("score")
        if score is None:
            return
        best = self.best_info()
        if best is None or score > best.get("score", -1):
            with open(self._best_path, "w") as f:
                json.dump({"step": int(step), "score": float(score),
                           **{k: float(v) for k, v in metrics.items()}}, f)

    def best_info(self) -> Optional[dict]:
        if not os.path.exists(self._best_path):
            return None
        with open(self._best_path) as f:
            return json.load(f)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def close(self) -> None:
        self._mgr.close()
