"""Optimization experiments on the flagship forward (real TPU).

Times candidate TPU-level optimizations with the chained-in-jit
methodology (bench.py): I3D in isolation, the effect of 1-pass bf16 MXU
passes (jax.default_matmul_precision) on each branch, and the sparse
backbone vs ROI-pool split of the LiDAR branch. Engineering tool — not
part of the driver contract.
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

from multimodal_gar_tpu.models import MGAR
from multimodal_gar_tpu.models.i3d import InceptionI3d
from multimodal_gar_tpu.models.lidar_backbone import LiDARBackbone, mean_vfe
from multimodal_gar_tpu.models.rgb_backbone import RGBBackbone
from multimodal_gar_tpu.models.sparse_backbone import (SparseTensor,
                                                       VoxelBackbone8x)
from multimodal_gar_tpu.utils.testing import flagship_config, synthetic_batch


def timed_chain(fn, perturb, args, k=20, iters=2):
    @partial(jax.jit, static_argnames=("kk",))
    def chained(args, kk):
        def body(i, carry):
            a, acc = carry
            s = fn(a)
            return (perturb(a, s), acc + s)
        _, acc = jax.lax.fori_loop(0, kk, body, (args, jnp.float32(0)))
        return acc

    float(chained(args, 1))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(chained(args, 1))
    t1 = (time.perf_counter() - t0) / iters
    float(chained(args, k))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(chained(args, k))
    tk = (time.perf_counter() - t0) / iters
    return max((tk - t1) / (k - 1), 1e-9)


def emit(name, t):
    print(json.dumps({"component": name, "ms": round(t * 1e3, 2)}),
          flush=True)


def main():
    cfg = flagship_config()
    batch = synthetic_batch(cfg, batch_size=1, n_valid=40)
    model = MGAR(cfg)
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(0), batch)

    # --- I3D alone ----------------------------------------------------
    i3d = InceptionI3d(final_endpoint=cfg.model.rgb.i3d_endpoint)
    i3d_vars = {
        "params": variables["params"]["rgb_backbone"]["i3d"],
        "batch_stats": variables["batch_stats"]["rgb_backbone"]["i3d"]}

    def i3d_fn(args):
        v, img = args
        return i3d.apply(v, img, train=False)[0, 0, 0, 0, 0]

    def perturb_i3d(args, s):
        v, img = args
        return (v, img + 0.0 * s)

    emit("i3d_f32", timed_chain(i3d_fn, perturb_i3d,
                                (i3d_vars, batch.images)))
    with jax.default_matmul_precision("bfloat16"):
        emit("i3d_bf16pass", timed_chain(i3d_fn, perturb_i3d,
                                         (i3d_vars, batch.images)))

    # --- full model under 1-pass bf16 ---------------------------------
    def full(args):
        v, b = args
        return model.apply(v, b, train=False).card[0, 0]

    def perturb_full(args, s):
        v, b = args
        return (v, b.replace(images=b.images + 0.0 * s,
                             voxels=b.voxels + 0.0 * s))

    with jax.default_matmul_precision("bfloat16"):
        emit("full_bf16pass", timed_chain(full, perturb_full,
                                          (variables, batch)))

    # --- LiDAR split: sparse backbone vs pool/NL tail ------------------
    lidar = LiDARBackbone(cfg.model.lidar, cfg.data.point_cloud)
    lidar_vars = {"params": variables["params"]["lidar_backbone"],
                  "batch_stats": variables["batch_stats"].get(
                      "lidar_backbone", {})}
    nx, ny, nz = cfg.data.point_cloud.grid_size
    bb = VoxelBackbone8x(
        max_voxels_per_stage=cfg.model.lidar.max_voxels_per_stage)
    bb_vars = {
        "params": variables["params"]["lidar_backbone"]["backbone3d"],
        "batch_stats": variables["batch_stats"]["lidar_backbone"][
            "backbone3d"]}

    def bb_fn(args):
        v, b = args
        feats = mean_vfe(b.voxels, b.voxel_num_points)
        feats = feats * b.voxel_valid[..., None].astype(feats.dtype)
        st = SparseTensor(features=feats, coords=b.voxel_coords,
                          valid=b.voxel_valid,
                          spatial_shape=(nz + 1, ny, nx))
        ms = bb.apply(v, st, False, b.rulebook)
        return sum(jnp.sum(m.features[0, 0]) for m in ms.values())

    def perturb_bb(args, s):
        v, b = args
        return (v, b.replace(voxels=b.voxels + 0.0 * s))

    emit("sparse_backbone", timed_chain(bb_fn, perturb_bb,
                                        (bb_vars, batch)))

    def lidar_fn(args):
        v, b = args
        out = lidar.apply(v, b.voxels, b.voxel_coords, b.voxel_num_points,
                          b.voxel_valid, b.boxes3d, b.person_valid,
                          train=False, rulebook=b.rulebook)
        return out[0, 0, 0]

    def perturb_lidar(args, s):
        v, b = args
        return (v, b.replace(voxels=b.voxels + 0.0 * s,
                             boxes3d=b.boxes3d + 0.0 * s))

    with jax.default_matmul_precision("bfloat16"):
        emit("lidar_bf16pass", timed_chain(lidar_fn, perturb_lidar,
                                           (lidar_vars, batch)))

    rgb = RGBBackbone(cfg.model.rgb)
    rgb_vars = {"params": variables["params"]["rgb_backbone"],
                "batch_stats": variables["batch_stats"].get("rgb_backbone",
                                                            {})}

    def rgb_fn(args):
        v, img, b2, pv = args
        out = rgb.apply(v, img, b2, train=False, valid=pv)
        return out[0, 0, 0]

    def perturb_rgb(args, s):
        v, img, b2, pv = args
        return (v, img + 0.0 * s, b2 + 0.0 * s, pv)

    with jax.default_matmul_precision("bfloat16"):
        emit("rgb_bf16pass", timed_chain(
            rgb_fn, perturb_rgb,
            (rgb_vars, batch.images, batch.boxes2d, batch.person_valid)))


if __name__ == "__main__":
    main()
