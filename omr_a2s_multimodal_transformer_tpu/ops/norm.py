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
    """x: [B, H, W, C]; valid: optional [B, H, W] bool (True = real pixel).

    Statistics accumulate in f32 regardless of input dtype (bf16-safe).
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    if valid is None:
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    else:
        m = valid[..., None].astype(jnp.float32)
        n = jnp.maximum(jnp.sum(m, axis=(1, 2), keepdims=True), 1.0)
        mean = jnp.sum(x32 * m, axis=(1, 2), keepdims=True) / n
        var = jnp.sum(jnp.square(x32 - mean) * m, axis=(1, 2), keepdims=True) / n
    return ((x32 - mean) * jnp.reciprocal(jnp.sqrt(var + eps))).astype(dtype)
