"""Compiled-program collective guards for the multichip train step.

VERDICT r4 item 5: the numeric agreement test (test_multichip_flagship.py)
cannot catch a sharding regression that keeps the math right but wrecks the
communication pattern — e.g. an accidental all-gather of image- or
voxel-sized activations (correct, slow). These tests lower the REAL train
step over the virtual meshes and assert on the compiled HLO itself:

  - a gradient reduction (all-reduce / reduce-scatter) is present and moves
    at least the full parameter footprint (DP semantics of reference
    train_func.py:512; collectives of pcdet/utils/commu_utils.py:50-168),
  - NO all-gather materializes an activation (batch-axis result, or a
    result larger than any parameter could be),
  - under fsdp the parameters are genuinely sharded (param-sized
    all-gathers DO appear, and the state sharding splits the fsdp axis).

Self-check: the same detector run on a deliberately-broken program (batch
replicated instead of sharded over 'data') must go red — a replicated batch
computes everything redundantly and needs no gradient reduction at all.
"""
from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_gar_tpu.config import MeshConfig
from multimodal_gar_tpu.models import MGAR
from multimodal_gar_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                              replicated, shard_batch,
                                              shard_train_state)
from multimodal_gar_tpu.train.train_state import (create_train_state,
                                                  make_train_step)
from multimodal_gar_tpu.utils.testing import synthetic_batch, tiny_config

_DTYPE_BYTES = {"f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1, "c64": 8, "c128": 16}

_SHAPE_RE = re.compile(r"\b([a-z]+\d*)\[([0-9,]*)\]")


def _shape_tokens(text: str):
    """(dtype, dims) for every typed shape token in an HLO fragment."""
    out = []
    for dt, dims in _SHAPE_RE.findall(text):
        if dt not in _DTYPE_BYTES:
            continue
        sizes = [int(d) for d in dims.split(",") if d] if dims else []
        out.append((dt, sizes))
    return out


def _result_bytes(line: str, op: str) -> int:
    """Total bytes of an HLO op's result (tuple results summed)."""
    lhs = line.split(f" {op}(")[0]
    lhs = lhs.split("=", 1)[1] if "=" in lhs else lhs
    return sum(int(np.prod(dims or [1])) * _DTYPE_BYTES[dt]
               for dt, dims in _shape_tokens(lhs))


def _collectives(hlo: str, op: str):
    """[(result_bytes, first_dim_or_None, line)] for each `op` in the HLO."""
    rows = []
    for ln in hlo.splitlines():
        if f" {op}(" not in ln:
            continue
        lhs = ln.split(f" {op}(")[0]
        lhs = lhs.split("=", 1)[1] if "=" in lhs else lhs
        toks = _shape_tokens(lhs)
        first_dims = {t[1][0] for t in toks if t[1]}
        rows.append((_result_bytes(ln, op), first_dims, ln.strip()))
    return rows


def _compiled_step(mesh, broken_batch: bool = False):
    """Lower + compile the full train step on `mesh`; return (hlo, state)."""
    cfg = tiny_config()
    model = MGAR(cfg)
    per = synthetic_batch(cfg, batch_size=1, n_valid=3)
    dp = mesh.shape["data"]
    batch = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * dp, axis=0), per)
    state, tx = create_train_state(cfg, model, per, jax.random.PRNGKey(0),
                                   cfg.train.stages[0], steps_per_epoch=8)
    state = shard_train_state(state, mesh)
    sh = replicated(mesh) if broken_batch else batch_sharding(mesh)
    batch = jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
    step = jax.jit(make_train_step(model, tx, "L_total"))
    compiled = step.lower(state, batch, jax.random.PRNGKey(1)).compile()
    return compiled.as_text(), state, batch


def _param_footprint(state):
    """(trainable_bytes, largest_leaf_bytes).

    The I3D subtree is frozen (stop_gradient, reference gat_model.py:990):
    its gradients are constant zeros, which XLA folds instead of reducing,
    so the gradient-reduction floor counts trainable parameters only.
    """
    leaves = jax.tree_util.tree_leaves(state.params)
    largest = max(l.size * l.dtype.itemsize for l in leaves)
    frozen = jax.tree_util.tree_leaves(
        state.params.get("rgb_backbone", {}).get("i3d", {}))
    frozen_b = sum(l.size * l.dtype.itemsize for l in frozen)
    total = sum(l.size * l.dtype.itemsize for l in leaves) - frozen_b
    return total, largest


@pytest.mark.slow
def test_data8_step_reduces_grads_and_never_gathers_activations():
    mesh = make_mesh(MeshConfig(data=8, fsdp=1))
    hlo, state, batch = _compiled_step(mesh)
    total_param_b, largest_param_b = _param_footprint(state)
    global_b = batch.images.shape[0]

    # 1) gradient reduction present and moves >= the full param footprint
    reduced = sum(b for b, _, _ in _collectives(hlo, "all-reduce"))
    reduced += sum(b for b, _, _ in _collectives(hlo, "reduce-scatter"))
    # 0.9 floor: a couple of head params are inactive under the stage-0
    # loss (constant-zero grads get folded, ~1 MB of 50); the guarded
    # failure mode — gradient psum missing or covering only a subset —
    # lands far below this line (the broken-batch program reduces ~0 B)
    assert reduced >= 0.9 * total_param_b, (
        f"all-reduced {reduced} B < trainable footprint {total_param_b} B — "
        "gradient psum missing or partial")

    # 2) NO all-gather of an activation: pure DP (fsdp=1) keeps params
    # replicated, so any all-gather result that is batch-led or larger
    # than every parameter is an activation being re-materialized
    for b, first_dims, ln in _collectives(hlo, "all-gather"):
        assert b <= largest_param_b, f"activation-sized all-gather: {ln}"
        assert global_b not in first_dims, f"batch-axis all-gather: {ln}"


@pytest.mark.slow
def test_fsdp_step_shards_params_and_bounds_gathers():
    mesh = make_mesh(MeshConfig(data=4, fsdp=2))
    hlo, state, batch = _compiled_step(mesh)
    total_param_b, largest_param_b = _param_footprint(state)
    global_b = batch.images.shape[0]

    # params are genuinely fsdp-sharded (red if shard_train_state regresses)
    n_sharded = sum(
        1 for l in jax.tree_util.tree_leaves(state.params)
        if "fsdp" in str(getattr(l, "sharding", "")))
    shardings = [l.sharding.spec for l in jax.tree_util.tree_leaves(
        state.params) if hasattr(l, "sharding")]
    n_split = sum(1 for s in shardings if any(ax == "fsdp" for ax in s))
    assert n_split > 0, "no parameter is split over the fsdp axis"

    # gradient reduction present
    reduced = sum(b for b, _, _ in _collectives(hlo, "all-reduce"))
    reduced += sum(b for b, _, _ in _collectives(hlo, "reduce-scatter"))
    assert reduced >= total_param_b // 2, (
        f"reduced {reduced} B vs param footprint {total_param_b} B")

    # param all-gathers exist (fsdp really shards something in the program)
    gathers = _collectives(hlo, "all-gather")
    assert gathers, "fsdp mesh compiled to zero all-gathers — params not sharded?"

    # ...but every all-gather is param-sized, never activation-sized
    for b, first_dims, ln in gathers:
        assert b <= largest_param_b, f"activation-sized all-gather: {ln}"
        assert global_b not in first_dims, f"batch-axis all-gather: {ln}"


@pytest.mark.slow
def test_detector_goes_red_on_broken_batch_sharding():
    """Self-check: replicate the batch (a deliberately-broken shard_batch)
    and the gradient-reduction guard must fire — a replicated batch needs
    no cross-device gradient sum, so the compiled program loses the psum."""
    mesh = make_mesh(MeshConfig(data=8, fsdp=1))
    hlo, state, _ = _compiled_step(mesh, broken_batch=True)
    total_param_b, _ = _param_footprint(state)
    reduced = sum(b for b, _, _ in _collectives(hlo, "all-reduce"))
    reduced += sum(b for b, _, _ in _collectives(hlo, "reduce-scatter"))
    assert reduced < 0.9 * total_param_b, (
        "broken (replicated-batch) program still all-reduces the full "
        "gradient — the detector in the tests above would not catch a "
        "shard_batch regression")
