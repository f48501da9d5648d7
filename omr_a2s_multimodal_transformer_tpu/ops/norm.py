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

    Statistics (mean/var) accumulate in f32 regardless of input dtype, but
    the normalization arithmetic stays in the input dtype: in bf16 training
    the stem is HBM-bandwidth bound, and f32 temporaries at full resolution
    double the traffic. Uses E[x^2]-E[x]^2 so only two f32 reductions of the
    (possibly bf16) input are needed, no f32 residual tensor.
    """
    dtype = x.dtype
    if valid is None:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
        mean_sq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2), keepdims=True)
    else:
        m = valid[..., None].astype(jnp.float32)
        n = jnp.maximum(jnp.sum(m, axis=(1, 2), keepdims=True), 1.0)
        x32m = x.astype(jnp.float32) * m
        mean = jnp.sum(x32m, axis=(1, 2), keepdims=True) / n
        mean_sq = jnp.sum(jnp.square(x.astype(jnp.float32)) * m, axis=(1, 2), keepdims=True) / n
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jnp.reciprocal(jnp.sqrt(var + eps))
    return (x - mean.astype(dtype)) * inv.astype(dtype)
