"""Attention mask construction (vectorized, jit-friendly).

The reference builds masks row-by-row in Python
(``/root/reference/src/transformer/decoder.py:150-217``,
``model.py:329-355``); here every mask is a closed-form broadcast.

Conventions: additive masks are float arrays added to attention logits
(0 = attend, NEG_INF = blocked). Boolean validity masks are True = valid.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e9  # finite stand-in for -inf (keeps softmax NaN-free when rows are fully blocked)


def windowed_causal_mask(length: int, window: int, dtype=jnp.float32) -> jnp.ndarray:
    """[L, L] additive mask: position i attends to [max(0, i-window), i].

    window <= 0 means unlimited (plain causal). Equivalent to the
    reference's ``create_variable_window_mask`` (decoder.py:191-217) /
    ``generate_square_subsequent_mask``.
    """
    i = jnp.arange(length)[:, None]
    j = jnp.arange(length)[None, :]
    allowed = j <= i
    if window > 0:
        allowed &= j >= i - window
    return jnp.where(allowed, 0.0, NEG_INF).astype(dtype)


def length_valid_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] bool, True where the position is valid."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def rect_valid_mask(hw: jnp.ndarray, grid_h: int, grid_w: int) -> jnp.ndarray:
    """Validity of a flattened 2D feature grid.

    hw: [B, 2] valid (h, w) per sample in *reduced* units. Returns
    [B, grid_h * grid_w] bool matching a row-major flatten of [grid_h, grid_w].

    The reference instead masks a prefix of length h*w
    (ar_dataset.py:439-442 + decoder.py:186-188), which mislabels positions
    whenever a sample's h or w is below the padded grid — we keep that
    variant available as `length_valid_mask` for parity experiments, but the
    rectangle is the correct semantics for padded batches.
    """
    hh = jnp.arange(grid_h)[None, :, None]  # [1, H, 1]
    ww = jnp.arange(grid_w)[None, None, :]  # [1, 1, W]
    valid = (hh < hw[:, 0][:, None, None]) & (ww < hw[:, 1][:, None, None])
    return valid.reshape(valid.shape[0], grid_h * grid_w)


def key_padding_additive(valid: jnp.ndarray, dtype=jnp.float32, torch_float_parity: bool = False) -> jnp.ndarray:
    """[B, S] bool validity -> [B, 1, 1, S] additive mask for attention logits.

    torch_float_parity=True reproduces the reference's accidental semantics:
    its float 0/1 key-padding masks are *added* to the logits by torch
    (+1.0 on pads instead of -inf), see decoder.py:186-189 with
    torch's ``_canonical_mask``. Default is proper masking.
    """
    pad_bias = 1.0 if torch_float_parity else NEG_INF
    return jnp.where(valid, 0.0, pad_bias).astype(dtype)[:, None, None, :]


def corner_attn_mask(q_valid: jnp.ndarray, k_valid: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, Lq], [B, Lk] -> [B, 1, Lq, Lk] additive mask blocking only the
    (pad query x pad key) corner — the reference's CrossAttention semantics
    (model.py:343-351): valid queries still see pad keys and vice versa."""
    blocked = (~q_valid)[:, :, None] & (~k_valid)[:, None, :]
    return jnp.where(blocked, NEG_INF, 0.0).astype(dtype)[:, None, :, :]


def key_valid_attn_mask(k_valid: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, Lk] -> [B, 1, 1, Lk] additive mask blocking pad keys (proper)."""
    return jnp.where(k_valid, 0.0, NEG_INF).astype(dtype)[:, None, None, :]
