"""Round-2 experiment set 3: stem decomposition, bf16 I3D, culled pool.

Probes (real TPU, chained-in-jit):
  - I3D stem endpoint-by-endpoint (conv1a / pool2a / conv2b / conv2c);
  - conv2c as a raw 3D conv vs a time-to-channel (t2c) 2D formulation;
  - I3D end-to-end with bf16 activations (HBM-bound hypothesis);
  - ROI grid pool with the per-box cull (ops/voxel.py voxel_query_boxed);
  - full model + LiDAR branch with the cull.
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
import numpy as np

from multimodal_gar_tpu.models import MGAR
from multimodal_gar_tpu.models.i3d import InceptionI3d
from multimodal_gar_tpu.models.lidar_backbone import LiDARBackbone
from multimodal_gar_tpu.models.roi_grid_pool import ROIGridPool
from multimodal_gar_tpu.models.sparse_backbone import (BACKBONE_STRIDES,
                                                       SparseTensor)
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


def synth_ms(cfg, seed=0):
    rng = np.random.default_rng(seed)
    nx, ny, nz = cfg.data.point_cloud.grid_size
    caps = cfg.model.lidar.max_voxels_per_stage
    ms = {}
    for name, cap_i, c in (("x_conv2", 1, 32), ("x_conv3", 2, 64),
                           ("x_conv4", 3, 64)):
        stride = BACKBONE_STRIDES[name]
        m = caps[cap_i]
        shape = (nz // stride + 1, ny // stride, nx // stride)
        coords = np.stack([rng.integers(0, shape[0], m),
                           rng.integers(0, shape[1], m),
                           rng.integers(0, shape[2], m)],
                          axis=1).astype(np.int32)
        ms[name] = SparseTensor(
            features=jnp.asarray(rng.normal(size=(1, m, c)).astype(np.float32)),
            coords=jnp.asarray(coords[None]),
            valid=jnp.ones((1, m), bool), spatial_shape=shape)
    return ms


def main():
    cfg = flagship_config()
    batch = synthetic_batch(cfg, batch_size=1, n_valid=40)

    # --- stem endpoint sweep ------------------------------------------
    for endpoint in ("Conv3d_1a_7x7", "MaxPool3d_2a_3x3", "Conv3d_2b_1x1"):
        i3d = InceptionI3d(final_endpoint=endpoint)
        v = jax.jit(partial(i3d.init, train=False))(
            jax.random.PRNGKey(0), batch.images)

        def fn(args, _i3d=i3d):
            vv, img = args
            return _i3d.apply(vv, img, train=False)[0, 0, 0, 0, 0]

        def pert(args, s):
            vv, img = args
            return (vv, img + 0.0 * s)

        emit(f"i3d_to_{endpoint}",
             timed_chain(fn, pert, (v, batch.images), k=10))

    # --- conv2c raw 3D vs time-to-channel 2D --------------------------
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 8, 180, 320, 64)).astype(np.float32))
    w3 = jnp.asarray(rng.normal(size=(3, 3, 3, 64, 192)).astype(np.float32)
                     * 0.05)

    def conv3d_fn(args):
        xx, ww = args
        y = jax.lax.conv_general_dilated(
            xx, ww, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y[0, 0, 0, 0, 0]

    def conv_pert(args, s):
        xx, ww = args
        return (xx + 0.0 * s, ww)

    emit("conv2c_raw3d", timed_chain(conv3d_fn, conv_pert, (x, w3), k=10))

    def conv2c_t2c(args):
        xx, ww = args                       # ww: (3, 3, 3, 64, 192)
        # stack t-1/t/t+1 along channels -> one 2D conv with 192 in-ch
        xpad = jnp.pad(xx, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        xt = jnp.concatenate([xpad[:, :-2], xpad[:, 1:-1], xpad[:, 2:]],
                             axis=-1)       # (1, 8, 180, 320, 192)
        b, t, h, wdt, c = xt.shape
        xt = xt.reshape(b * t, h, wdt, c)
        # kernel layout: (kt, kh, kw, i, o) -> (kh, kw, kt*i, o)
        w2 = ww.transpose(1, 2, 0, 3, 4).reshape(3, 3, 3 * 64, 192)
        y = jax.lax.conv_general_dilated(
            xt, w2, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[0, 0, 0, 0]

    emit("conv2c_t2c", timed_chain(conv2c_t2c, conv_pert, (x, w3), k=10))

    # --- I3D bf16 activations ----------------------------------------
    i3d16 = InceptionI3d(final_endpoint="Mixed_4f", dtype=jnp.bfloat16)
    v16 = jax.jit(partial(i3d16.init, train=False))(
        jax.random.PRNGKey(0), batch.images)

    def fn16(args):
        vv, img = args
        return i3d16.apply(vv, img.astype(jnp.bfloat16),
                           train=False)[0, 0, 0, 0, 0].astype(jnp.float32)

    def pert16(args, s):
        vv, img = args
        return (vv, img + 0.0 * s)

    emit("i3d_bf16_act", timed_chain(fn16, pert16, (v16, batch.images),
                                     k=10))

    # --- culled ROI grid pool + branch/full ---------------------------
    ms = synth_ms(cfg)
    pool = ROIGridPool(cfg.model.lidar, cfg.data.point_cloud)
    pv = jax.jit(partial(pool.init, train=False))(
        jax.random.PRNGKey(0), ms, batch.boxes3d, batch.person_valid)

    def pool_fn(args):
        v, ms_in, rois = args
        pooled, _ = pool.apply(v, ms_in, rois, batch.person_valid,
                               train=False)
        return pooled[0, 0, 0, 0]

    def pool_pert(args, s):
        v, ms_in, rois = args
        ms2 = {k2: SparseTensor(features=st.features + 0.0 * s,
                                coords=st.coords, valid=st.valid,
                                spatial_shape=st.spatial_shape)
               for k2, st in ms_in.items()}
        return (v, ms2, rois + 0.0 * s)

    emit("roi_grid_pool_culled",
         timed_chain(pool_fn, pool_pert, (pv, ms, batch.boxes3d), k=10))

    lidar = LiDARBackbone(cfg.model.lidar, cfg.data.point_cloud)
    model = MGAR(cfg)
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(0), batch)
    lidar_vars = {"params": variables["params"]["lidar_backbone"],
                  "batch_stats": variables["batch_stats"].get(
                      "lidar_backbone", {})}

    def lidar_fn(args):
        v, b = args
        out = lidar.apply(v, b.voxels, b.voxel_coords, b.voxel_num_points,
                          b.voxel_valid, b.boxes3d, b.person_valid,
                          train=False, rulebook=b.rulebook)
        return out[0, 0, 0]

    def lidar_pert(args, s):
        v, b = args
        return (v, b.replace(voxels=b.voxels + 0.0 * s,
                             boxes3d=b.boxes3d + 0.0 * s))

    emit("lidar_branch_culled",
         timed_chain(lidar_fn, lidar_pert, (lidar_vars, batch)))

    def full(args):
        v, b = args
        return model.apply(v, b, train=False).card[0, 0]

    def perturb_full(args, s):
        v, b = args
        return (v, b.replace(images=b.images + 0.0 * s,
                             voxels=b.voxels + 0.0 * s,
                             boxes2d=b.boxes2d + 0.0 * s,
                             boxes3d=b.boxes3d + 0.0 * s))

    emit("full_culled", timed_chain(full, perturb_full, (variables, batch)))


if __name__ == "__main__":
    main()
