"""Instance normalization (NHWC) with optional validity masking.

Reference: ``nn.InstanceNorm2d(eps=1e-3, affine=False,
track_running_stats=False)`` (encoder.py:151-156, 210-215) — per-sample,
per-channel normalization over the spatial dims with biased variance and no
learned affine. The reference normalizes over padded pixels too; the masked
variant (normalize over the valid rectangle only) is available behind a flag
for padding-insensitive batched inference.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def instance_norm(x: jnp.ndarray, eps: float = 1e-3, valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: [B, H, W, C]; valid: optional [B, H, W] bool (True = real pixel)."""
    if valid is None:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
    else:
        m = valid[..., None].astype(x.dtype)
        n = jnp.maximum(jnp.sum(m, axis=(1, 2), keepdims=True), 1.0)
        mean = jnp.sum(x * m, axis=(1, 2), keepdims=True) / n
        var = jnp.sum(jnp.square(x - mean) * m, axis=(1, 2), keepdims=True) / n
    return (x - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
