"""On-device image frontend: normalize + aspect-preserving resize.

Device-side, batched counterpart of the host PIL path
(``data/frontends.py``/reference preprocessing.py:44-52). Raw uint8 images
(right/bottom zero-padded to a static shape) are normalized to [0, 1] and
optionally resized to a fixed height on the TPU, keeping ingest off the
host CPU for serving. PIL stays the bit-parity path for training caches
(bicubic kernels differ slightly between PIL and XLA).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("target_height", "target_width", "method"))
def preprocess_image_batch(
    raw: jnp.ndarray,  # [B, H, W] uint8 or float
    hw: jnp.ndarray,  # [B, 2] valid (h, w) per sample
    target_height: Optional[int] = None,
    target_width: Optional[int] = None,
    method: str = "bicubic",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ([B, H', W', 1] float32 in [0,1] padded with white, [B, 2] new hw).

    With target_height set, each image is conceptually resized to that height
    preserving aspect; implemented batched as a full-tensor resize of the
    padded canvas (scale = target_height / H) so one program serves the whole
    batch. Valid dims are rescaled accordingly; padding is forced to white
    (1.0), the collate pad value for scores.
    """
    x = raw.astype(jnp.float32)
    if jnp.issubdtype(raw.dtype, jnp.integer):  # 0..255 -> 0..1
        x = x / 255.0
    b, h, w = x.shape

    if target_height is not None and target_height != h:
        scale = target_height / h
        new_w = target_width or int(round(w * scale))
        x = jax.image.resize(x, (b, target_height, new_w), method=method)
        hw = jnp.stack(
            [
                jnp.full((b,), target_height, jnp.int32),
                jnp.clip(jnp.round(hw[:, 1].astype(jnp.float32) * scale), 1, new_w).astype(jnp.int32),
            ],
            axis=1,
        )
        h, w = target_height, new_w

    # force padding back to white after resize bleed
    hh = jnp.arange(h)[None, :, None] < hw[:, 0][:, None, None]
    ww = jnp.arange(w)[None, None, :] < hw[:, 1][:, None, None]
    valid = hh & ww
    x = jnp.where(valid, jnp.clip(x, 0.0, 1.0), 1.0)
    return x[..., None], hw
