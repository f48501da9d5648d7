"""Loss functions."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_ignore_pad(logits: jnp.ndarray, targets: jnp.ndarray, pad_id: int = 0) -> jnp.ndarray:
    """Token-level CE with ignore_index=pad (mean over non-pad tokens),
    matching ``CrossEntropyLoss(ignore_index=PAD)`` (reference model.py:109).

    logits: [B, L, V] (any float dtype; log-softmax in f32); targets: [B, L].

    Written as fused reductions (nll = lse - logit[target]) rather than
    ``log_softmax`` + gather: materializing the [B, L, V] f32 log-prob
    tensor for a per-row gather ran at 62 GB/s effective in the flagship
    trace (11 ms/step at b4, L=1268, V=6997). Here every [B, L, V]
    intermediate (convert, exp, one-hot select) fuses into a reduction
    pass over the bf16 logits, so only [B, L] tensors reach HBM in the
    forward; the backward's only big write is the unavoidable d_logits.
    """
    xf = logits.astype(jnp.float32)  # fuses into the reduces below, not materialized
    t = targets.astype(jnp.int32)
    m = jnp.max(xf, axis=-1)
    lse = m + jnp.log(jnp.sum(jnp.exp(xf - m[..., None]), axis=-1))
    v_iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, logits.ndim - 1)
    tgt_logit = jnp.sum(jnp.where(v_iota == t[..., None], xf, 0.0), axis=-1)
    nll = lse - tgt_logit
    mask = (targets != pad_id).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
