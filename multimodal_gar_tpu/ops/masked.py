"""Masking primitives for the padded-actor design.

The reference slices every tensor to ``person_num`` valid actors inside a Python
loop (gat_model.py:1396-1400). The TPU-native design keeps everything at the
fixed MAX_PEOPLE size and threads a boolean validity mask instead, so the whole
model is a single jit-compiled program with static shapes.
"""
from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e30


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Softmax over ``axis`` with invalid positions (mask==False) excluded.

    Rows that are entirely masked return zeros.
    """
    logits = jnp.where(mask, logits, NEG_INF)
    m = jnp.max(logits, axis=axis, keepdims=True)
    e = jnp.exp(logits - jax_stop_grad_max(m)) * mask.astype(logits.dtype)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, 1e-20)


def jax_stop_grad_max(m: jnp.ndarray) -> jnp.ndarray:
    import jax
    return jax.lax.stop_gradient(m)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None, keepdims=False) -> jnp.ndarray:
    """Mean of x over positions where mask is True."""
    mask = mask.astype(x.dtype)
    total = jnp.sum(x * mask, axis=axis, keepdims=keepdims)
    count = jnp.sum(mask, axis=axis, keepdims=keepdims)
    return total / jnp.maximum(count, 1.0)


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis=None, keepdims=False,
               fill: float = NEG_INF) -> jnp.ndarray:
    """Max of x over positions where mask is True (fill where all-masked)."""
    return jnp.max(jnp.where(mask, x, fill), axis=axis, keepdims=keepdims)


def masked_layer_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                      eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last dim (feature dim is never padded, so this is
    plain LN; provided here for symmetry with the masked-BN path)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * gamma + beta
