"""Multi-head attention core (XLA path).

Shapes use head-split layout [B, L, H, Dh]. Masks are additive [.., Lq, Lk]
broadcastable to [B, H, Lq, Lk]. The Pallas flash kernel in
``ops/flash_packed.py`` is a drop-in for the softmax(QK^T)V part on TPU;
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
    """softmax(q k^T / sqrt(dh) + mask) v with f32 softmax accumulation.

    compute_dtype=None keeps k/v in their stored dtype (q is cast down to
    match). Critical for KV-cached decode: casting a bfloat16 cache to f32
    makes XLA materialize a 2x-sized copy of the whole cache EVERY step —
    measured 8.1 -> ~1.5 ms/step at the flagship shape (b8, S=12.7k, 8
    layers). The MXU natively accumulates bf16 x bf16 -> f32
    (preferred_element_type), so softmax math stays f32 either way.
    """
    dh = q.shape[-1]
    out_dtype = jnp.float32 if compute_dtype is None else q.dtype
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    if compute_dtype is None:
        q = q.astype(k.dtype)
    else:
        q, k, v = q.astype(compute_dtype), k.astype(compute_dtype), v.astype(compute_dtype)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", weights.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(out_dtype)


def attend_packed_single_query(
    q: jnp.ndarray,  # [B, D] (any float dtype; cast to the KV dtype)
    k_packed: jnp.ndarray,  # [B, S, D] head-packed keys (stored dtype)
    v_packed: jnp.ndarray,  # [B, S, D] head-packed values
    n_heads: int,
    mem_bias: Optional[jnp.ndarray] = None,  # [B, S] additive (f32)
    k_scale: Optional[jnp.ndarray] = None,  # [B, D] dequant scales (int8 KV)
    v_scale: Optional[jnp.ndarray] = None,  # [B, D]
    k_tscale: Optional[jnp.ndarray] = None,  # [B, S] per-token scales (int4 KV)
    v_tscale: Optional[jnp.ndarray] = None,  # [B, S]
) -> jnp.ndarray:
    """Single-query multi-head attention over head-packed K/V. Returns [B, D] f32.

    Decode-time cross-attention reads the whole K/V from HBM every step —
    the flagship-shape bandwidth floor (8 layers x 12.7k keys x 256 x 2).
    Storing K/V as [B, S, H, Dh] lets XLA tile-pad the tiny trailing
    (H=4, Dh=64) dims up to the (sublane, lane) tile — up to 8x the bytes.
    Keeping them packed as [B, S, 256] is lane-aligned and exact.

    The per-head dot never reshapes the big arrays: a block-diagonal
    expander turns q [B, D] into qbd [B, D, H] (column h holds q's head-h
    slice), so logits = K @ qbd contracts the packed D dim per head on the
    MXU; the output side symmetrically computes P^T @ V -> [B, H, D] and
    takes the h-th Dh-block of row h. Measured 8.1 -> ~1.3 ms/step at
    b8/S=12696/8-layers (vs the 1.19 ms/step pure-KV-read floor).

    Int8/int4 KV (k_scale/v_scale given): storage is per-(batch, channel)
    symmetric int8 (or TPU-native s4, two values per byte); the K scales fold into q before the dot and the V
    scales fold into the output after it, so the big arrays are read as
    int8 and converted in-register (XLA fuses the convert into the dot —
    measured 0.62 ms/step vs 1.19 bf16 at b8/S=12.7k/8-layers).

    Rank-1 int4 (k_tscale/v_tscale additionally given): storage is
    round(t / (s_c[d] * s_t[s])) with a per-channel AND a per-token scale.
    Both folds stay off the big arrays: s_t(K) multiplies the [B, S, H]
    logits elementwise, s_t(V) multiplies the softmax weights before the
    PV dot. Per-token scales keep one outlier position (e.g. a padded
    memory column, which prefill cannot mask) from inflating a channel's
    scale for every position — the failure mode that cost channel-only
    int4 +6.2 SER at corpus scale.
    """
    b, s, d = k_packed.shape
    dh = d // n_heads
    scale = 1.0 / float(dh) ** 0.5
    dt = jnp.bfloat16 if jnp.issubdtype(k_packed.dtype, jnp.integer) else k_packed.dtype
    qf = q.astype(jnp.float32)
    if k_scale is not None:
        qf = qf * k_scale.astype(jnp.float32)
    sel = (jnp.arange(d)[:, None] // dh == jnp.arange(n_heads)[None]).astype(dt)  # [D, H]
    qbd = qf.astype(dt)[:, :, None] * sel[None]  # [B, D, H]
    logits = jnp.einsum(
        "bsd,bdh->bsh", k_packed.astype(dt), qbd, preferred_element_type=jnp.float32
    ) * scale
    if k_tscale is not None:
        logits = logits * k_tscale.astype(jnp.float32)[:, :, None]
    if mem_bias is not None:
        logits = logits + mem_bias.astype(jnp.float32)[:, :, None]
    w = jax.nn.softmax(logits, axis=1)  # over S
    if v_tscale is not None:
        w = w * v_tscale.astype(jnp.float32)[:, :, None]
    o_full = jnp.einsum(
        "bsh,bsd->bhd", w.astype(dt), v_packed.astype(dt), preferred_element_type=jnp.float32
    )
    hh = jnp.arange(n_heads)
    out = o_full.reshape(b, n_heads, n_heads, dh)[:, hh, hh, :].reshape(b, d)
    if v_scale is not None:
        out = out * v_scale.astype(jnp.float32)
    return out
