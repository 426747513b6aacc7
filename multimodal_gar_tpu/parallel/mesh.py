"""Device mesh + sharding: the TPU-native scale-out layer.

Replaces the reference's parallelism stack (SURVEY.md §2.7):
  - nn.DataParallel (train_func.py:512) and the dormant DDP/NCCL infra
    (pcdet common_utils.py:144-186, commu_utils.py) become ONE jit-compiled
    train step over a jax.sharding.Mesh: the batch is sharded along the
    'data' axis, parameters are replicated (or FSDP-sharded along 'fsdp'),
    and XLA emits the gradient all-reduce over ICI automatically.
  - DistributedSampler (pcdet datasets/__init__.py:31-51) becomes per-process
    input sharding in the data pipeline (data/pipeline.py).
  - pickle all_gather / merge_results_dist become
    jax.experimental.multihost_utils.process_allgather at eval time.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


def make_mesh(cfg: MeshConfig, devices: Optional[list] = None) -> Mesh:
    """Build a ('data', 'fsdp') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    fsdp = max(cfg.fsdp, 1)
    data = cfg.data if cfg.data > 0 else n // fsdp
    assert data * fsdp == n, f"mesh {data}x{fsdp} != {n} devices"
    arr = np.asarray(devices).reshape(data, fsdp)
    return Mesh(arr, axis_names=("data", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim of every batch leaf over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch with the batch dim sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def fsdp_param_sharding(params: Any, mesh: Mesh) -> Any:
    """FSDP-style sharding rule: split each parameter's largest divisible
    axis over 'fsdp'; replicate otherwise. With fsdp=1 everything replicates."""
    fsdp = mesh.shape["fsdp"]

    def rule(x):
        if fsdp == 1 or x.ndim == 0:
            return NamedSharding(mesh, P())
        sizes = list(x.shape)
        order = sorted(range(len(sizes)), key=lambda i: -sizes[i])
        for ax in order:
            if sizes[ax] % fsdp == 0 and sizes[ax] >= fsdp:
                spec = [None] * len(sizes)
                spec[ax] = "fsdp"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def shard_train_state(state: Any, mesh: Mesh) -> Any:
    """Place a TrainState on the mesh: params AND optimizer moments per the
    FSDP rule (Adam's m/v are 2x the param bytes — replicating them would
    forfeit most of FSDP's memory savings), everything else replicated.
    Optimizer leaves shaped like a parameter get that parameter's sharding;
    scalars/counters replicate."""
    param_sh = fsdp_param_sharding(state.params, mesh)

    def opt_rule(x):
        if hasattr(x, "ndim") and x.ndim > 0:
            return fsdp_param_sharding(x, mesh)   # per-leaf rule
        return replicated(mesh)

    def put(x, sh):
        return jax.device_put(x, sh)

    return state.replace(
        params=jax.tree_util.tree_map(put, state.params, param_sh),
        batch_stats=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated(mesh)), state.batch_stats),
        opt_state=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, opt_rule(x)), state.opt_state),
        step=jax.device_put(state.step, replicated(mesh)),
    )
