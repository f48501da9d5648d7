"""Banded (sliding-window) causal self-attention in pure XLA.

The reference's attention-window mechanism (decoder.py:191-217) is a mask
over a full [L, L] attention matrix — O(L^2) compute and memory even though
only a W-wide band is live. Here the band is computed directly: queries are
chunked into blocks of C >= W; each block attends to itself and the previous
block only ([B, n, C, 2C] logits), which is exact for window <= C. Compute
drops from O(L^2 D) to O(L * 2C * D) and autodiff works through it, so this
is the *training-time* windowed attention (the Pallas flash kernel covers
inference; this covers gradients).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def banded_causal_attention(
    q: jnp.ndarray,  # [B, L, H, Dh]
    k: jnp.ndarray,  # [B, L, H, Dh]
    v: jnp.ndarray,  # [B, L, H, Dh]
    window: int,
    key_bias: Optional[jnp.ndarray] = None,  # [B, L] additive per-key bias (pad masking)
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    chunk: Optional[int] = None,
) -> jnp.ndarray:
    """softmax over keys in [i-window, i] only. Exact equivalent of full
    attention with the windowed causal mask. Returns [B, L, H, Dh]."""
    b, l, h, dh = q.shape
    c = chunk or max(_round_up(window, 128), 128)
    assert window <= c, f"window {window} must fit in chunk {c}"
    lp = _round_up(l, c)
    n = lp // c

    def pad_seq(x, fill=0.0):
        return jnp.pad(x, ((0, 0), (0, lp - l)) + ((0, 0),) * (x.ndim - 2), constant_values=fill)

    qc = pad_seq(q).reshape(b, n, c, h, dh)
    kc = pad_seq(k).reshape(b, n, c, h, dh)
    vc = pad_seq(v).reshape(b, n, c, h, dh)
    # previous chunk (zeros before chunk 0)
    k_prev = jnp.pad(kc, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :n]
    v_prev = jnp.pad(vc, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :n]
    k2 = jnp.concatenate([k_prev, kc], axis=2)  # [B, n, 2C, H, Dh]
    v2 = jnp.concatenate([v_prev, vc], axis=2)

    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    logits = jnp.einsum(
        "bnqhd,bnkhd->bnhqk", qc.astype(jnp.float32), k2.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * scale  # [B, n, H, C, 2C]

    # positions: query i_global = n_idx*C + qi ; key j_global = (n_idx-1)*C + kj
    qi = jax.lax.broadcasted_iota(jnp.int32, (c, 2 * c), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (c, 2 * c), 1)
    rel = (qi + c) - kj  # = i_global - j_global (independent of n_idx)
    allowed = (rel >= 0) & (rel <= window)
    # chunk 0 has no previous chunk: keys kj < C are padding there
    n_idx = jnp.arange(n)[:, None, None]
    in_range = (n_idx * c + (kj - c)) >= 0  # j_global >= 0
    mask = allowed[None] & in_range  # [n, C, 2C]
    logits = jnp.where(mask[None, :, None], logits, -1e9)

    if key_bias is not None:
        kb = jnp.pad(key_bias.astype(jnp.float32), ((0, 0), (0, lp - l))).reshape(b, n, c)
        kb_prev = jnp.pad(kb, ((0, 0), (1, 0), (0, 0)))[:, :n]
        kb2 = jnp.concatenate([kb_prev, kb], axis=2)  # [B, n, 2C]
        logits = logits + kb2[:, :, None, None, :]

    weights = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum(
        "bnhqk,bnkhd->bnqhd", weights.astype(q.dtype), v2,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    return out.reshape(b, lp, h, dh)[:, :l]
