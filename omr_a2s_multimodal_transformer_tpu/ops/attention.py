"""Multi-head attention core (XLA path).

Shapes use head-split layout [B, L, H, Dh]. Masks are additive [.., Lq, Lk]
broadcastable to [B, H, Lq, Lk]. The Pallas flash kernel in
``ops/flash_attention.py`` is a drop-in for the softmax(QK^T)V part on TPU;
this module is the reference implementation and the autodiff path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    b, l, d = x.shape
    return x.reshape(b, l, n_heads, d // n_heads)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, l, h, dh = x.shape
    return x.reshape(b, l, h * dh)


def attend(
    q: jnp.ndarray,  # [B, Lq, H, Dh]
    k: jnp.ndarray,  # [B, Lk, H, Dh]
    v: jnp.ndarray,  # [B, Lk, H, Dh]
    mask: Optional[jnp.ndarray] = None,  # additive, broadcastable to [B, H, Lq, Lk]
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(dh) + mask) v with f32 softmax accumulation."""
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(compute_dtype), k.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", weights.astype(compute_dtype), v.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)
