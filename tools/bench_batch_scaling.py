"""Per-component batch-scaling profile of the flagship eval forward (TPU).

VERDICT r4 item 1: eval throughput is batch-INVERTED (b1 10.45 > b2 9.35 >
b4 8.52 clips/s @ 40k) — super-linear per-step cost that contradicts both
the HBM-bound and latency-bound models. This tool measures each forward
component at b in {1, 2, 4} with the chained-in-jit methodology (bench.py
docstring) and prints per-clip ms per component, so the op(s) whose cost
grows super-linearly in batch get a name.

Components:
  full        whole MGAR eval forward (40k voxel cap)
  stem        I3D Conv3d_1a_7x7 (Pallas im2col stem)
  i3d         I3D through Mixed_4f (stem + body)
  rgb         full RGB branch (i3d + RoIAlign + NL + embed)
  lidar       full LiDAR branch (sparse backbone + ROI grid pool + NL)
  sparse      VoxelBackbone8x alone (mean_vfe + 4 sparse stages)
  chunk1      b-batch eval as lax.map over single-clip forwards (the
              peak-memory-free batching baseline)

Derived: body = i3d - stem, rgb_post = rgb - i3d, tail = full - rgb - lidar.

Usage: python tools/bench_batch_scaling.py [--batches 1,2,4] [--cap 40000]
       [--k 12] [--components full,i3d,...]
Each measurement prints one JSON line; redirect to a file for ROUND5_NOTES.
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from multimodal_gar_tpu.models import MGAR
from multimodal_gar_tpu.models.i3d import InceptionI3d
from multimodal_gar_tpu.models.lidar_backbone import LiDARBackbone
from multimodal_gar_tpu.models.rgb_backbone import RGBBackbone
from multimodal_gar_tpu.utils.testing import flagship_config, synthetic_batch


def timed_chain(fn, perturb, args, k=12, iters=2):
    """fn(args)->scalar; perturb(args, s)->args'. Per-call seconds."""
    @partial(jax.jit, static_argnames=("kk",))
    def chained(args, kk):
        def body(i, carry):
            a, acc = carry
            s = fn(a)
            return (perturb(a, s), acc + s)
        _, acc = jax.lax.fori_loop(0, kk, body, (args, jnp.float32(0)))
        return acc

    def run(kk):
        float(chained(args, kk))           # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            float(chained(args, kk))
        return (time.perf_counter() - t0) / iters

    t1 = run(1)
    tk = run(k)
    return max((tk - t1) / (k - 1), 1e-9)


def _perturb_batch(b, s):
    z = 0.0 * s
    return b.replace(images=b.images + z.astype(b.images.dtype),
                     voxels=b.voxels + z.astype(b.voxels.dtype),
                     boxes2d=b.boxes2d + z.astype(b.boxes2d.dtype),
                     boxes3d=b.boxes3d + z.astype(b.boxes3d.dtype))


def build_probes(cfg, batch, components, chunk=None):
    """{name: (fn, perturb, args)} probes at this batch size."""
    probes = {}
    B = batch.images.shape[0]

    if "full" in components or "chunk1" in components:
        model = MGAR(cfg)
        init_b = batch if chunk is None else jax.tree_util.tree_map(
            lambda x: x[:1], batch)
        mvars = jax.jit(partial(model.init, train=False))(
            jax.random.PRNGKey(0), init_b)

    if "full" in components:
        def full_fn(args):
            v, b = args
            out = model.apply(v, b, train=False)
            return jnp.sum(out.card) + jnp.sum(out.a_theta)

        probes["full"] = (full_fn, lambda a, s: (a[0], _perturb_batch(a[1], s)),
                          (mvars, batch))

    if "chunk1" in components and B > 1:
        def chunk_fn(args):
            v, b = args
            folded = jax.tree_util.tree_map(
                lambda x: x.reshape((B, 1) + x.shape[1:]), b)
            out = jax.lax.map(lambda bb: model.apply(v, bb, train=False),
                              folded)
            return jnp.sum(out.card) + jnp.sum(out.a_theta)

        probes["chunk1"] = (chunk_fn,
                            lambda a, s: (a[0], _perturb_batch(a[1], s)),
                            (mvars, batch))

    if "stem" in components:
        stem = InceptionI3d(final_endpoint="Conv3d_1a_7x7",
                            pallas_stem=cfg.model.rgb.pallas_stem,
                            stem_passes=getattr(cfg.model.rgb,
                                                "pallas_stem_passes", 3))
        svars = jax.jit(partial(stem.init, train=False))(
            jax.random.PRNGKey(0), batch.images)

        def stem_fn(args):
            v, img = args
            return jnp.sum(stem.apply(v, img, train=False))

        probes["stem"] = (stem_fn,
                          lambda a, s: (a[0], a[1] + 0.0 * s),
                          (svars, batch.images))

    if "i3d" in components:
        center = (getattr(cfg.model.rgb, "i3d_center_slice", False)
                  and cfg.model.rgb.i3d_endpoint == "Mixed_4f")
        i3d = InceptionI3d(final_endpoint=cfg.model.rgb.i3d_endpoint,
                           pallas_stem=cfg.model.rgb.pallas_stem,
                           stem_passes=getattr(cfg.model.rgb,
                                               "pallas_stem_passes", 3),
                           center_slice=center,
                           batch_unroll=getattr(cfg.model.rgb,
                                                "i3d_batch_unroll", False))
        ivars = jax.jit(partial(i3d.init, train=False))(
            jax.random.PRNGKey(0), batch.images)

        def i3d_fn(args):
            v, img = args
            return jnp.sum(i3d.apply(v, img, train=False))

        probes["i3d"] = (i3d_fn,
                         lambda a, s: (a[0], a[1] + 0.0 * s),
                         (ivars, batch.images))

    if "rgb" in components:
        rgb = RGBBackbone(cfg.model.rgb)
        rvars = jax.jit(partial(
            rgb.init, train=False))(jax.random.PRNGKey(0), batch.images,
                                    batch.boxes2d, valid=batch.person_valid)

        def rgb_fn(args):
            v, img, b2, pv = args
            return jnp.sum(rgb.apply(v, img, b2, train=False, valid=pv))

        probes["rgb"] = (rgb_fn,
                         lambda a, s: (a[0], a[1] + 0.0 * s, a[2] + 0.0 * s,
                                       a[3]),
                         (rvars, batch.images, batch.boxes2d,
                          batch.person_valid))

    if "sparse" in components:
        # VoxelBackbone8x alone (mean_vfe + 4 sparse stages, no ROI pool):
        # splits the lidar branch's batch scaling into backbone vs pool+NL
        from multimodal_gar_tpu.models.lidar_backbone import mean_vfe
        from multimodal_gar_tpu.models.sparse_backbone import (SparseTensor,
                                                               VoxelBackbone8x)
        nx, ny, nz = cfg.data.point_cloud.grid_size
        bb = VoxelBackbone8x(
            max_voxels_per_stage=cfg.model.lidar.max_voxels_per_stage,
            x_window=getattr(cfg.model.lidar, "x_window", False),
            x_window_fused=getattr(cfg.model.lidar, "x_window_fused", False))

        def make_st(b):
            f = mean_vfe(b.voxels, b.voxel_num_points)
            f = f * b.voxel_valid[..., None].astype(f.dtype)
            return SparseTensor(features=f, coords=b.voxel_coords,
                                valid=b.voxel_valid,
                                spatial_shape=(nz + 1, ny, nx))

        bvars = jax.jit(partial(bb.init, train=False))(
            jax.random.PRNGKey(0), make_st(batch), rulebook=batch.rulebook)

        def sparse_fn(args):
            v, b = args
            ms = bb.apply(v, make_st(b), train=False, rulebook=b.rulebook)
            return sum(jnp.sum(s.features) for s in ms.values())

        probes["sparse"] = (sparse_fn,
                            lambda a, s: (a[0], _perturb_batch(a[1], s)),
                            (bvars, batch))

    if "lidar" in components:
        lidar = LiDARBackbone(cfg.model.lidar, cfg.data.point_cloud)

        def lidar_apply(v, b):
            return lidar.apply(v, b.voxels, b.voxel_coords,
                               b.voxel_num_points, b.voxel_valid, b.boxes3d,
                               b.person_valid, train=False,
                               rulebook=b.rulebook)

        lvars = jax.jit(partial(lidar.init, train=False))(
            jax.random.PRNGKey(0), batch.voxels, batch.voxel_coords,
            batch.voxel_num_points, batch.voxel_valid, batch.boxes3d,
            batch.person_valid, rulebook=batch.rulebook)

        def lidar_fn(args):
            v, b = args
            return jnp.sum(lidar_apply(v, b))

        probes["lidar"] = (lidar_fn,
                           lambda a, s: (a[0], _perturb_batch(a[1], s)),
                           (lvars, batch))

    return probes


def main():
    argv = sys.argv[1:]

    def arg(flag, default):
        return argv[argv.index(flag) + 1] if flag in argv else default

    batches = [int(b) for b in arg("--batches", "1,2,4").split(",")]
    cap = int(arg("--cap", "40000"))
    k = int(arg("--k", "12"))
    components = arg("--components", "full,stem,i3d,rgb,lidar,chunk1").split(",")

    cfg = flagship_config(max_voxels=cap)
    # dotted config overrides for A/Bs, e.g.
    #   --overrides model.rgb.i3d_center_slice=true
    if "--overrides" in argv:
        import yaml
        from multimodal_gar_tpu.config import _apply_override
        for ov in arg("--overrides", "").split(","):
            key, _, raw = ov.partition("=")
            cfg = _apply_override(cfg, key.strip().split("."),
                                  yaml.safe_load(raw))
    results = {}
    for B in batches:
        batch = synthetic_batch(cfg, batch_size=B, n_valid=100)
        probes = build_probes(cfg, batch, components)
        for name, (fn, perturb, args) in probes.items():
            try:
                sec = timed_chain(fn, perturb, args, k=k)
            except Exception as e:  # OOM at larger batches: record and move on
                msg = str(e).splitlines()[-1][-200:] if str(e) else repr(e)
                print(json.dumps({"component": name, "batch": B,
                                  "error": msg}), flush=True)
                continue
            results[(name, B)] = sec
            print(json.dumps({"component": name, "batch": B, "cap": cap,
                              "ms": round(sec * 1e3, 2),
                              "ms_per_clip": round(sec * 1e3 / B, 2)}),
                  flush=True)
        # derived decompositions at this batch
        def emit_derived(name, sec):
            print(json.dumps({"component": name, "batch": B, "cap": cap,
                              "ms": round(sec * 1e3, 2),
                              "ms_per_clip": round(sec * 1e3 / B, 2),
                              "derived": True}), flush=True)

        g = lambda n: results.get((n, B))
        if g("i3d") and g("stem"):
            emit_derived("body=i3d-stem", g("i3d") - g("stem"))
        if g("rgb") and g("i3d"):
            emit_derived("rgb_post=rgb-i3d", g("rgb") - g("i3d"))
        if g("full") and g("rgb") and g("lidar"):
            emit_derived("tail=full-rgb-lidar",
                         g("full") - g("rgb") - g("lidar"))
        if g("lidar") and g("sparse"):
            emit_derived("pool=lidar-sparse", g("lidar") - g("sparse"))


if __name__ == "__main__":
    main()
