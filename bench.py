"""Benchmark: MGAR throughput on one chip — eval batch sweep, train step, MFU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
  - metric/value: best eval clips/sec/chip across the batch sweep (1/2/4/8)
    at the reference's FULL working point (720x1280x15 frames, 16k voxels,
    100 actor slots — mil3.yaml).
  - detail: per-batch eval clips/s, full-res train steps/s (batch 1,
    grad+Adam+accum), bf16-backbone rerun at the best batch, analytic fwd
    FLOPs from XLA cost analysis, and the resulting MFU.

Timing methodology: the remote-TPU transport has ~30-100 ms per-call
round-trip latency and block_until_ready does not reliably await execution,
so naive dispatch-loop timing is invalid (it "measured" 23 PFLOP/s). Instead
K passes are chained *inside one jit* (each iteration's input depends on the
previous output, forcing serial execution) with a single scalar transfer at
the end; per-pass time = (t_K - t_1) / (K - 1). The train chain is serialized
for free: step k's loss depends on step k-1's params.

Baseline: the reference publishes no timing numbers (BASELINE.md); the driver
target is >=5x clips/sec over a CPU baseline. vs_baseline is the speedup over
the pinned single-core CPU measurement of this same chained eval program at
batch 1 (re-measure with `python bench.py --cpu-baseline`; ~1 h on 1 core).
"""
from __future__ import annotations

import json
import time
from functools import partial

# re-measured 2026-08-18 on the round-3 program (x-window gathers + folded
# BN sped the CPU run up too; the round-2 pin was 0.0073)
CPU_BASELINE_CLIPS_PER_SEC = 0.0220

# Peak bf16 MXU throughput per chip, FLOP/s (public spec sheets).
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _peak_flops() -> float:
    import jax
    kind = jax.devices()[0].device_kind
    for name, peak in _PEAK_BF16.items():
        if kind.lower().startswith(name.lower()):
            return peak
    return 197e12  # default: v5e


def _serialize(b, s):
    """Make every branch of the model input data-dependent on scalar s.

    XLA hoists any loop-invariant branch out of the chained loop (observed:
    perturbing only images let the whole LiDAR path run once, inflating
    clips/s 10x), so EVERY input the model reads must depend on the previous
    iteration's output.
    """
    z = (0.0 * s).astype(b.images.dtype)
    return b.replace(images=b.images + z,
                     voxels=b.voxels + (0.0 * s).astype(b.voxels.dtype),
                     boxes2d=b.boxes2d + (0.0 * s).astype(b.boxes2d.dtype),
                     boxes3d=b.boxes3d + (0.0 * s).astype(b.boxes3d.dtype))


def build_eval(batch_size: int = 1, dtype: str = "float32",
               chunk: int | None = None, cfg_patch=None):
    import jax

    from multimodal_gar_tpu.models import MGAR
    from multimodal_gar_tpu.utils.testing import flagship_config, synthetic_batch

    cfg = flagship_config(dtype=dtype)
    if cfg_patch is not None:
        cfg = cfg_patch(cfg)
    batch = synthetic_batch(cfg, batch_size=batch_size, n_valid=40)
    model = MGAR(cfg)
    init_b = batch if chunk is None else jax.tree_util.tree_map(
        lambda x: x[:chunk], batch)
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(0), init_b)

    # Parameters as explicit args (NOT a closure): closed-over arrays become
    # HLO constants re-uploaded by the remote transport every call (~2.4 s).
    if chunk is None:
        def fn(variables, batch):
            return model.apply(variables, batch, train=False)
    else:
        # batch sizes whose monolithic program exceeds HBM run as a
        # lax.map over sub-batches: one compiled program, peak activation
        # memory of a `chunk`-clip forward (eval stores no residuals, so
        # remat has nothing to free — chunking IS the eval-side fix).
        assert batch_size % chunk == 0

        def fn(variables, batch):
            folded = jax.tree_util.tree_map(
                lambda x: x.reshape((batch_size // chunk, chunk)
                                    + x.shape[1:]), batch)
            return jax.lax.map(
                lambda b: model.apply(variables, b, train=False), folded)

    return fn, variables, batch


def _chain_eval(fn):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("k",))
    def chained(variables, batch, k):
        def body(i, carry):
            b, acc = carry
            out = fn(variables, b)
            s = out.card.ravel()[0]
            return (_serialize(b, s), acc + s)

        _, acc = jax.lax.fori_loop(0, k, body, (batch, jnp.float32(0)))
        return acc

    return chained

def _timed(chained, args, k: int, iters: int = 3) -> float:
    float(chained(*args, k))      # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        float(chained(*args, k))  # scalar transfer forces completion
    return (time.perf_counter() - t0) / iters


def eval_throughput(batch_size: int, dtype: str = "float32",
                    k: int | None = None, chunk: int | None = None,
                    cfg_patch=None) -> float:
    """clips/sec at the flagship config; raises on OOM."""
    fn, variables, batch = build_eval(batch_size, dtype, chunk=chunk,
                                      cfg_patch=cfg_patch)
    chained = _chain_eval(fn)
    if k is None:
        k = max(8, 40 // batch_size)
    t1 = _timed(chained, (variables, batch), 1)
    tk = _timed(chained, (variables, batch), k)
    per_call = max((tk - t1) / (k - 1), 1e-9)
    return batch_size / per_call


def fwd_flops(batch_size: int = 1) -> float | None:
    """Analytic forward FLOPs for one eval call from XLA cost analysis."""
    import jax
    fn, variables, batch = build_eval(batch_size)
    try:
        cost = jax.jit(fn).lower(variables, batch).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def train_throughput(batch_size: int = 1, k: int = 8,
                     cfg_patch=None) -> float:
    """Full-res train steps/sec: forward+backward+Adam (accum-8 MultiSteps)."""
    import jax
    import jax.numpy as jnp

    from multimodal_gar_tpu.models import MGAR
    from multimodal_gar_tpu.train.train_state import (create_train_state,
                                                      make_train_step)
    from multimodal_gar_tpu.utils.testing import flagship_config, synthetic_batch

    cfg = flagship_config()
    if cfg_patch is not None:
        cfg = cfg_patch(cfg)
    batch = synthetic_batch(cfg, batch_size=batch_size, n_valid=40)
    model = MGAR(cfg)
    state, tx = create_train_state(cfg, model, batch, jax.random.PRNGKey(0),
                                   cfg.train.stages[0], steps_per_epoch=64)
    step = make_train_step(model, tx, cfg.train.stages[0].loss)

    @partial(jax.jit, static_argnames=("k",))
    def chained(state, batch, rng, k):
        def body(i, carry):
            st, b = carry
            st, metrics = step(st, b, rng)
            return (st, _serialize(b, metrics["loss"]))

        st, _ = jax.lax.fori_loop(0, k, body, (state, batch))
        # depend on the final optimizer update so it cannot be dead-code'd
        leaves = jax.tree_util.tree_leaves(st.params)
        return sum(jnp.sum(l.ravel()[:1]) for l in leaves) + st.step

    rng = jax.random.PRNGKey(1)
    t1 = _timed(chained, (state, batch, rng), 1, iters=2)
    tk = _timed(chained, (state, batch, rng), k, iters=2)
    per_step = max((tk - t1) / (k - 1), 1e-9)
    return 1.0 / per_step


def _try(fn, *args, **kw):
    try:
        return fn(*args, **kw)
    except Exception as e:  # OOM on large batches, missing cost analysis, ...
        import sys
        print(f"bench: {fn.__name__}{args} failed: {type(e).__name__}: "
              f"{str(e)[:200]}", file=sys.stderr)
        return None


def main():
    import sys
    if "--cpu-baseline" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
        cps = eval_throughput(1, k=4)
        print(f"cpu baseline clips/s: {cps:.4f}")
        return

    import jax as _jax
    _jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    quick = "--quick" in sys.argv
    sweep = {}
    chunked = {}
    for b in ([1] if quick else [1, 2, 4, 8]):
        sweep[str(b)] = _try(eval_throughput, b)
        if sweep[str(b)] is None and b > 1:
            # monolithic program exceeds HBM: lax.map over sub-batches
            for ch in (4, 2, 1):
                if ch >= b:
                    continue
                v = _try(eval_throughput, b, chunk=ch)
                if v is not None:
                    sweep[str(b)] = v
                    chunked[str(b)] = ch
                    break

    measured = {int(k): v for k, v in sweep.items() if v}
    if not measured:
        print(json.dumps({"metric": "clips_per_sec_per_chip", "value": 0.0,
                          "unit": "clips/s", "vs_baseline": 0.0,
                          "detail": {"error": "all batch sizes failed",
                                     "eval_clips_per_sec": sweep}}))
        return
    best_b = max(measured, key=measured.get)
    best = measured[best_b]

    detail = {"eval_clips_per_sec": sweep, "best_batch": best_b}
    if chunked:
        detail["eval_chunked_batches"] = chunked
    if not quick:
        detail["eval_bf16_clips_per_sec_best_batch"] = _try(
            eval_throughput, best_b, "bfloat16")
        detail["train_steps_per_sec_b1_fullres"] = _try(train_throughput, 1)

        def _remat(cfg):
            import dataclasses
            model = dataclasses.replace(
                cfg.model, rgb=dataclasses.replace(cfg.model.rgb,
                                                   i3d_remat=True))
            return dataclasses.replace(cfg, model=model)

        v = _try(train_throughput, 2)
        if v is None:
            v = _try(train_throughput, 2, cfg_patch=_remat)
            if v is not None:
                detail["train_b2_remat"] = True
        detail["train_steps_per_sec_b2_fullres"] = v
        flops = _try(fwd_flops, 1)
        if flops:
            peak = _peak_flops()
            detail["fwd_flops_per_clip"] = flops
            detail["eval_mfu_vs_bf16_peak"] = round(
                flops * measured.get(1, best) / peak, 4)
    import jax
    detail["device"] = jax.devices()[0].device_kind

    print(json.dumps({
        "metric": "clips_per_sec_per_chip",
        "value": round(best, 4),
        "unit": "clips/s",
        "vs_baseline": round(best / CPU_BASELINE_CLIPS_PER_SEC, 2),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
