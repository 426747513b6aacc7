"""Per-layer probes for the sparse backbone's 17.7 ms (VERDICT r2 next #8).

Separates, at flagship shapes with the host rulebook:
  - the full VoxelBackbone8x forward;
  - gather-only cost (neighbor gather + mask, reduced by sum — no GEMM);
  - GEMM-only cost (einsum on a pre-materialized dense (B,M,27,C) tensor);
  - a bf16-features variant of the full backbone (halves gather bytes).

Usage: python tools/bench_sparse.py
Timing: chained-K methodology (see bench.py docstring).
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

from multimodal_gar_tpu.models.sparse_backbone import (SparseTensor,
                                                       VoxelBackbone8x)
from multimodal_gar_tpu.utils.testing import flagship_config, synthetic_batch


def timed_chain(fn, perturb, args, k=20, iters=2):
    @partial(jax.jit, static_argnames=("kk",))
    def chained(args, kk):
        def body(i, carry):
            a, acc = carry
            s = fn(a)
            return (perturb(a, 0.0 * s), acc + s)

        _, acc = jax.lax.fori_loop(0, kk, body, (args, jnp.float32(0)))
        return acc

    def run(kk):
        float(chained(args, kk))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(chained(args, kk))
        return (time.perf_counter() - t0) / iters

    t1, tk = run(1), run(k)
    return (tk - t1) / (k - 1)


def main():
    cfg = flagship_config()
    batch = synthetic_batch(cfg, batch_size=1, n_valid=40)
    feats0 = jnp.mean(batch.voxels, axis=2)  # (B, M, 4) meanVFE-ish
    caps = (16000, 16000, 8000, 4000)
    nz, ny, nx = 41, 2000, 2000
    st0 = SparseTensor(features=feats0, coords=batch.voxel_coords,
                       valid=batch.voxel_valid, spatial_shape=(nz, ny, nx))

    results = {}
    for name, dt, xw, fused in [("f32", jnp.float32, False, False),
                                ("bf16", jnp.bfloat16, False, False),
                                ("xwin_f32", jnp.float32, True, False),
                                ("xwin_bf16", jnp.bfloat16, True, False),
                                ("xwin_fused", jnp.float32, True, True)]:
        bb = VoxelBackbone8x(max_voxels_per_stage=caps, dtype=dt, x_window=xw,
                             x_window_fused=fused)

        def perturb(args, z):
            st, rb = args
            return (st.replace(features=st.features + z.astype(
                st.features.dtype)), rb)

        try:
            variables = jax.jit(partial(bb.init, train=False))(
                jax.random.PRNGKey(0), st0, rulebook=batch.rulebook)

            def fn(args, bb=bb, variables=variables):
                st, rb = args
                ms = bb.apply(variables, st, train=False, rulebook=rb)
                return sum(jnp.sum(v.features).astype(jnp.float32)
                           for v in ms.values())

            t = timed_chain(fn, perturb, (st0, batch.rulebook))
            results[f"backbone_{name}"] = t
            print(f"backbone full ({name}): {t * 1e3:.2f} ms", flush=True)
        except Exception as e:
            # fused path: uncompilable on this image's Mosaic (see
            # ops/pallas/window_conv.py hardware status)
            results[f"backbone_{name}"] = None
            print(f"backbone full ({name}) FAILED: "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)

    # gather-only: every layer's neighbor gather at its true (M, C) shape,
    # reduced by sum — no GEMMs
    rb = batch.rulebook
    shapes = [("nbr_0", 16000, 4, 16), ("nbr_0", 16000, 16, 16),
              ("down_1", 16000, 16, 32),
              ("nbr_1", 16000, 32, 32), ("nbr_1", 16000, 32, 32),
              ("down_2", 8000, 32, 64),
              ("nbr_2", 8000, 64, 64), ("nbr_2", 8000, 64, 64),
              ("down_3", 4000, 64, 64),
              ("nbr_3", 4000, 64, 64), ("nbr_3", 4000, 64, 64)]

    def gather_fn(args):
        feats, rb = args
        acc = jnp.float32(0)
        for key, m, c, _ in shapes:
            idx = rb[key][:, :m]
            f = feats[:, :idx.shape[1], :c]
            safe = jnp.clip(idx, 0)
            hit = (idx >= 0)[..., None].astype(f.dtype)
            g = jax.vmap(lambda ff, ii: ff[ii])(f, safe) * hit
            acc += jnp.sum(g)
        return acc

    big = jnp.zeros((1, 16000, 64), jnp.float32)

    def perturb_g(args, z):
        feats, rb = args
        return (feats + z, rb)

    t = timed_chain(gather_fn, perturb_g, (big, rb))
    results["gather_only"] = t
    print(f"gather-only (11 layers): {t * 1e3:.2f} ms", flush=True)

    # GEMM-only on pre-materialized (B, M, 27, C)
    rng = np.random.default_rng(0)
    ws = {}
    gs = {}
    for i, (key, m, c, cout) in enumerate(shapes):
        ws[i] = jnp.asarray(rng.normal(size=(27, c, cout)).astype(np.float32))
        gs[i] = jnp.asarray(rng.normal(size=(1, m, 27, c)).astype(np.float32))

    def gemm_fn(args):
        gs, ws = args
        acc = jnp.float32(0)
        for i in range(len(shapes)):
            out = jnp.einsum("bmkc,kcd->bmd", gs[i], ws[i])
            acc += jnp.sum(out)
        return acc

    def perturb_m(args, z):
        gs, ws = args
        return ({i: g + z for i, g in gs.items()}, ws)

    t = timed_chain(gemm_fn, perturb_m, (gs, ws))
    results["gemm_only"] = t
    print(f"gemm-only (11 layers): {t * 1e3:.2f} ms", flush=True)

    import json
    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
