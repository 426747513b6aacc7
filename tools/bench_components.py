"""Component-level timing of the flagship MGAR forward on the real TPU.

Chained-in-jit methodology (see bench.py) applied to each stage in
isolation: I3D feature extraction, RoIAlign+NL embed (full RGB branch),
sparse backbone, ROI grid pool (full LiDAR branch), and the fusion+heads
tail. Prints one JSON line per component. Not part of the driver contract —
an engineering tool for finding the next optimization target.

Methodology note (learned the hard way): probe outputs must be FULL
reductions (jnp.sum) of the component output. Returning a single element
lets XLA slice-propagate through shallow ops and skip most of the work —
a 306-GFLOP conv "measured" 0.06 ms that way, and the ROI grid pool
reported 12 ms when its honest cost was 30.8 ms.
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
from multimodal_gar_tpu.models.rgb_backbone import RGBBackbone
from multimodal_gar_tpu.models.lidar_backbone import LiDARBackbone
from multimodal_gar_tpu.utils.testing import flagship_config, synthetic_batch


def timed_chain(fn, perturb, args, k=20, iters=2):
    """fn(args)->scalar; perturb(args, s)->args'. Chains k calls in one jit."""
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


def main():
    cfg = flagship_config()
    batch = synthetic_batch(cfg, batch_size=1, n_valid=40)
    model = MGAR(cfg)
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(0), batch)

    # full model
    def full(args):
        v, b = args
        out = model.apply(v, b, train=False)
        return jnp.sum(out.a_theta) + jnp.sum(out.card)

    def perturb_full(args, s):
        v, b = args
        b = b.replace(images=b.images + 0.0 * s,
                      voxels=b.voxels + 0.0 * s,
                      boxes2d=b.boxes2d + 0.0 * s,
                      boxes3d=b.boxes3d + 0.0 * s)
        return (v, b)

    t_full = timed_chain(full, perturb_full, (variables, batch))
    print(json.dumps({"component": "full", "ms": round(t_full * 1e3, 2)}))

    # RGB branch (I3D + RoIAlign + NL + embed)
    rgb = RGBBackbone(cfg.model.rgb)
    rgb_vars = {"params": variables["params"]["rgb_backbone"],
                "batch_stats": variables["batch_stats"].get("rgb_backbone",
                                                            {})}

    def rgb_fn(args):
        v, img, b2, pv = args
        out = rgb.apply(v, img, b2, train=False, valid=pv)
        return jnp.sum(out)

    def perturb_rgb(args, s):
        v, img, b2, pv = args
        return (v, img + 0.0 * s, b2 + 0.0 * s, pv)

    t_rgb = timed_chain(
        rgb_fn, perturb_rgb,
        (rgb_vars, batch.images, batch.boxes2d, batch.person_valid))
    print(json.dumps({"component": "rgb_branch", "ms": round(t_rgb * 1e3, 2)}))

    # LiDAR branch
    lidar = LiDARBackbone(cfg.model.lidar, cfg.data.point_cloud)
    lidar_vars = {"params": variables["params"]["lidar_backbone"],
                  "batch_stats": variables["batch_stats"].get(
                      "lidar_backbone", {})}

    def lidar_fn(args):
        v, b = args
        out = lidar.apply(v, b.voxels, b.voxel_coords, b.voxel_num_points,
                          b.voxel_valid, b.boxes3d, b.person_valid,
                          train=False, rulebook=b.rulebook)
        return jnp.sum(out)

    def perturb_lidar(args, s):
        v, b = args
        return (v, b.replace(voxels=b.voxels + 0.0 * s,
                             boxes3d=b.boxes3d + 0.0 * s))

    t_lidar = timed_chain(lidar_fn, perturb_lidar, (lidar_vars, batch))
    print(json.dumps({"component": "lidar_branch",
                      "ms": round(t_lidar * 1e3, 2)}))

    print(json.dumps({"component": "fusion_tail_residual",
                      "ms": round((t_full - t_rgb - t_lidar) * 1e3, 2)}))


if __name__ == "__main__":
    main()
