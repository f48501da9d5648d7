"""Loss functions."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_ignore_pad(logits: jnp.ndarray, targets: jnp.ndarray, pad_id: int = 0) -> jnp.ndarray:
    """Token-level CE with ignore_index=pad (mean over non-pad tokens),
    matching ``CrossEntropyLoss(ignore_index=PAD)`` (reference model.py:109).

    logits: [B, L, V] (any float dtype; log-softmax in f32); targets: [B, L].
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    mask = (targets != pad_id).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
