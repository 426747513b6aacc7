"""Pallas TPU kernel: fused submanifold-conv gather-GEMM.

The sparse backbone's inner op is ``out[i] = sum_k W[k]^T f[nbr[i, k]]``
(models/sparse_backbone.py). The XLA path materializes the (M, 27, C)
gathered tensor in HBM; this kernel reformulates the gather as an on-the-fly
one-hot matmul so everything runs on the MXU with no scattered HBM reads:

  for each output tile (BM rows) and each tap k:
      onehot = (col_ids == nbr[:, k, None])           # (BM, M), built in VMEM
      acc   += (onehot @ F) @ W[k]                    # two MXU matmuls

Absent neighbors are encoded as -1 and produce all-zero one-hot rows, so no
separate masking is needed. The full feature array stays resident in VMEM
(M x C <= ~2 MB at flagship shapes).

Trade-off: O(27 * M^2 * C) MXU FLOPs instead of O(27 * M * C) gathered bytes.
Measured on v5e at M=8192, C=D=32: 2.8 ms vs the XLA gather path's 1.3 ms —
the per-tap one-hot construction (BM x M compares on the VPU) dominates, so
the XLA formulation remains the production default; this kernel documents the
MXU-gather technique and wins only when gathers are pathologically slow
(e.g. much larger C with strided layouts).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(nbr_ref, feat_ref, w_ref, out_ref, *, taps: int):
    bm = out_ref.shape[0]
    m = feat_ref.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (bm, m), 1)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for k in range(taps):
        idx = nbr_ref[:, k]                                        # (BM,)
        onehot = (col_ids == idx[:, None]).astype(jnp.bfloat16)    # (BM, M)
        g = jnp.dot(onehot, feat_ref[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)            # (BM, C)
        acc = acc + jnp.dot(g, w_ref[k],
                            preferred_element_type=jnp.float32)    # (BM, D)
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def subm_conv_pallas(features: jnp.ndarray, nbr: jnp.ndarray,
                     weights: jnp.ndarray, block_m: int = 256,
                     interpret: bool | None = None) -> jnp.ndarray:
    """Fused sparse-conv tap accumulation.

    Args:
      features: (M, C) voxel features (padded rows zero).
      nbr: (M, K3) int32 neighbor rows, -1 where absent.
      weights: (K3, C, D) tap weights.
    Returns:
      (M, D) float32 outputs.
    """
    m, c = features.shape
    k3 = nbr.shape[1]
    d = weights.shape[-1]
    block_m = min(block_m, m)
    assert m % block_m == 0, (m, block_m)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    return pl.pallas_call(
        functools.partial(_kernel, taps=k3),
        grid=(m // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, k3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),     # features, full
            pl.BlockSpec(memory_space=pltpu.VMEM),     # weights, full
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.float32),
        interpret=interpret,
    )(nbr, features, weights)


def subm_conv_xla(features: jnp.ndarray, nbr: jnp.ndarray,
                  weights: jnp.ndarray) -> jnp.ndarray:
    """Reference XLA gather + einsum formulation (same contract)."""
    hit = (nbr >= 0)[..., None].astype(features.dtype)
    g = features[jnp.clip(nbr, 0)] * hit
    return jnp.einsum("mkc,kcd->md", g, weights)
