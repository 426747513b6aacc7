"""TPU hardware benchmark for zoo detectors at a realistic working point.

VERDICT r2 weak #7: the detector zoo was validated tiny-shape on the CPU
mesh only. This tool compiles and times SECOND and CenterPoint on the real
chip at a KITTI-like working point (the reference's SECOND config:
0.05 m voxels over (0, -40, -3, 70.4, 40, 1) -> 1408x1600x40 grid, 16k
voxel cap, ~120k-point scans — pcdet/tools/cfgs/kitti_models/second.yaml),
with the host-built rulebook path real data uses.

Usage: python tools/bench_zoo.py [SECOND CenterPoint ...]
Timing: K chained iterations inside one jit minus the k=1 time (the remote
transport makes dispatch-loop timing invalid — see bench.py docstring).
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


class _SyntheticKitti:
    """frame() provider for assemble_det_batch: a KITTI-like scan."""

    def __init__(self, cfg, n_points=120_000):
        self.range = cfg.point_cloud_range
        self.n = n_points

    def frame(self, idx):
        rng = np.random.default_rng(idx)
        pr = self.range
        # ground-plane-heavy z profile (real scans are not z-uniform)
        xy = rng.uniform([pr[0], pr[1]], [pr[3], pr[4]], (self.n, 2))
        z = np.where(rng.random(self.n) < 0.7,
                     rng.normal(-1.6, 0.15, self.n),
                     rng.uniform(pr[2], pr[5], self.n))
        z = np.clip(z, pr[2], pr[5] - 1e-4).astype(np.float32)
        pts = np.concatenate(
            [xy.astype(np.float32), z[:, None],
             rng.random(self.n, np.float32)[:, None]], axis=1)
        g = 24
        gt = np.zeros((g, 7), np.float32)
        gt[:, 0] = rng.uniform(pr[0] + 3, pr[3] - 3, g)
        gt[:, 1] = rng.uniform(pr[1] + 3, pr[4] - 3, g)
        gt[:, 2] = rng.normal(-1.0, 0.2, g)
        gt[:, 3:6] = rng.uniform([3.2, 1.4, 1.4], [4.5, 1.8, 1.8], (g, 3))
        gt[:, 6] = rng.uniform(-np.pi, np.pi, g)
        return {"points": pts, "gt_boxes": gt,
                "gt_classes": rng.integers(1, 4, g).astype(np.int32)}


def _serialize(b, s):
    z = (0.0 * s)
    return b.replace(voxels=b.voxels + z.astype(b.voxels.dtype),
                     gt_boxes=b.gt_boxes + z.astype(b.gt_boxes.dtype))


def _timed(chained, args, k, iters=3):
    float(chained(*args, k))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(chained(*args, k))
    return (time.perf_counter() - t0) / iters


def bench_detector(name: str, batch_size: int = 1, k: int = 8):
    from multimodal_gar_tpu.data.detbatch import assemble_det_batch
    from multimodal_gar_tpu.detection.detectors import build_detector, \
        default_config
    from multimodal_gar_tpu.detection.train import (create_det_train_state,
                                                    make_det_train_step)
    import dataclasses

    base, _, variant = name.partition(":")
    cfg = default_config(base)
    if variant == "xwin":
        cfg = dataclasses.replace(cfg, x_window=True)
    model = build_detector(base, cfg)
    ds = _SyntheticKitti(cfg)
    t0 = time.perf_counter()
    batch = assemble_det_batch(ds, list(range(batch_size)), cfg.voxel_size,
                               max_voxels=16000, max_gt=32,
                               rulebook_caps=cfg.max_voxels_per_stage,
                               x_window=cfg.x_window)
    host_s = time.perf_counter() - t0
    n_active = int(np.asarray(batch.voxel_valid.sum()))
    print(f"[{name}] host voxelize+rulebook: {host_s:.2f} s, "
          f"{n_active} active voxels (b={batch_size})", flush=True)

    state, tx = create_det_train_state(model, batch, jax.random.PRNGKey(0))
    step = make_det_train_step(model, tx)

    @partial(jax.jit, static_argnames=("k",))
    def chained_train(state, batch, rng, k):
        def body(i, carry):
            st, b = carry
            st, m = step(st, b, rng)
            return (st, _serialize(b, m["loss"]))

        st, _ = jax.lax.fori_loop(0, k, body, (state, batch))
        leaves = jax.tree_util.tree_leaves(st.params)
        return sum(jnp.sum(l.ravel()[:1]) for l in leaves) + st.step

    rng = jax.random.PRNGKey(1)
    t1 = _timed(chained_train, (state, batch, rng), 1, iters=2)
    tk = _timed(chained_train, (state, batch, rng), k, iters=2)
    train_sps = (k - 1) / max(tk - t1, 1e-9)
    print(f"[{name}] train steps/s (b={batch_size}): {train_sps:.2f}",
          flush=True)

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @partial(jax.jit, static_argnames=("k",))
    def chained_eval(variables, batch, k):
        def body(i, carry):
            b, acc = carry
            preds = model.apply(variables, b, train=False)
            out = model.predict(preds)
            s = out["scores"].ravel()[0]
            return (_serialize(b, s), acc + s)

        _, acc = jax.lax.fori_loop(0, k, body, (batch, jnp.float32(0)))
        return acc

    t1 = _timed(chained_eval, (variables, batch), 1)
    tk = _timed(chained_eval, (variables, batch), k)
    eval_sps = (k - 1) / max(tk - t1, 1e-9)
    print(f"[{name}] eval scans/s (b={batch_size}): "
          f"{eval_sps * batch_size:.2f}", flush=True)
    return {"train_steps_per_sec": train_sps,
            "eval_scans_per_sec": eval_sps * batch_size,
            "host_voxelize_sec": host_s, "active_voxels": n_active}


def main():
    names = sys.argv[1:] or ["SECOND", "CenterPoint"]
    results = {}
    for name in names:
        try:
            results[name] = bench_detector(name)
        except Exception as e:
            print(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            results[name] = {"error": str(e)[:300]}
    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
