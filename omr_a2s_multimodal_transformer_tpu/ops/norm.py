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
    stat = jnp.promote_types(dtype, jnp.float32)  # f32 stats for bf16/f32; f64 in f64 tests
    if valid is None:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=stat)
        mean_sq = jnp.mean(jnp.square(x.astype(stat)), axis=(1, 2), keepdims=True)
    else:
        m = valid[..., None].astype(stat)
        n = jnp.maximum(jnp.sum(m, axis=(1, 2), keepdims=True), 1.0)
        x32m = x.astype(stat) * m
        mean = jnp.sum(x32m, axis=(1, 2), keepdims=True) / n
        mean_sq = jnp.sum(jnp.square(x.astype(stat)) * m, axis=(1, 2), keepdims=True) / n
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jnp.reciprocal(jnp.sqrt(var + eps))
    return (x - mean.astype(dtype)) * inv.astype(dtype)


def instance_norm_packed(
    x: jnp.ndarray, f: int, eps: float = 1e-3, valid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Instance norm over a width-packed tensor (``ops/packed_conv.py``).

    x: [B, H, W/f, f*C] with channel layout (w-slot, c); statistics are per
    original channel c, reducing over (H, W/f, slot) — numerically identical
    to ``instance_norm`` on the unpacked [B, H, W, C] tensor. valid is the
    original-resolution [B, H, W] mask (reshaped, not shrunk, here).
    """
    if f == 1:
        return instance_norm(x, eps=eps, valid=valid)
    dtype = x.dtype
    stat = jnp.promote_types(dtype, jnp.float32)
    b, h, wp, fc = x.shape
    c = fc // f
    xg = x.reshape(b, h, wp, f, c)
    if valid is None:
        mean = jnp.mean(xg, axis=(1, 2, 3), keepdims=True, dtype=stat)
        mean_sq = jnp.mean(jnp.square(xg.astype(stat)), axis=(1, 2, 3), keepdims=True)
    else:
        m = valid.reshape(b, h, wp, f)[..., None].astype(stat)
        n = jnp.maximum(jnp.sum(m, axis=(1, 2, 3), keepdims=True), 1.0)
        mean = jnp.sum(xg.astype(stat) * m, axis=(1, 2, 3), keepdims=True) / n
        mean_sq = jnp.sum(jnp.square(xg.astype(stat)) * m, axis=(1, 2, 3), keepdims=True) / n
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jnp.reciprocal(jnp.sqrt(var + eps))
    out = (xg - mean.astype(dtype)) * inv.astype(dtype)
    return out.reshape(b, h, wp, fc)
