"""Round-2 experiment set 2: LiDAR tail split + I3D endpoint sweep."""
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


def synth_ms(cfg, batch, seed=0):
    """Synthetic multi-scale sparse tensors with flagship shapes."""
    rng = np.random.default_rng(seed)
    nx, ny, nz = cfg.data.point_cloud.grid_size
    caps = cfg.model.lidar.max_voxels_per_stage
    chans = {"x_conv2": 32, "x_conv3": 64, "x_conv4": 64}
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
        feats = rng.normal(size=(1, m, c)).astype(np.float32)
        ms[name] = SparseTensor(
            features=jnp.asarray(feats),
            coords=jnp.asarray(coords[None]),
            valid=jnp.ones((1, m), bool),
            spatial_shape=shape)
    return ms


def main():
    cfg = flagship_config()
    batch = synthetic_batch(cfg, batch_size=1, n_valid=40)

    # --- I3D endpoint sweep -------------------------------------------
    for endpoint in ("Conv3d_2c_3x3", "Mixed_3c", "Mixed_4f"):
        i3d = InceptionI3d(final_endpoint=endpoint)
        v = jax.jit(partial(i3d.init, train=False))(
            jax.random.PRNGKey(0), batch.images)

        def fn(args, _i3d=i3d):
            vv, img = args
            return _i3d.apply(vv, img, train=False)[0, 0, 0, 0, 0]

        def pert(args, s):
            vv, img = args
            return (vv, img + 0.0 * s)

        emit(f"i3d_to_{endpoint}", timed_chain(fn, pert, (v, batch.images),
                                               k=10))

    # --- ROI grid pool alone ------------------------------------------
    ms = synth_ms(cfg, batch)
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
        ms2 = {k: SparseTensor(features=st.features + 0.0 * s,
                               coords=st.coords, valid=st.valid,
                               spatial_shape=st.spatial_shape)
               for k, st in ms_in.items()}
        return (v, ms2, rois + 0.0 * s)

    emit("roi_grid_pool", timed_chain(pool_fn, pool_pert,
                                      (pv, ms, batch.boxes3d), k=10))


if __name__ == "__main__":
    main()
