"""Training-time stochastic curriculum utilities.

- Token corruption ("teacher forcing" in the reference's naming): with
  probability p, replace each non-pad decoder-input token with a uniform
  random vocab id. Vectorized with explicit PRNG (the reference uses a
  Python double loop for the unimodal model, model.py:152-160, and a
  vectorized torch version for the multimodal one, model.py:545-559 — both
  draw uniformly over the full vocab including PAD; we match that).

- Modality dropout draw (reference model.py:561-575): with probability p
  use a single modality (50/50 image/audio) for this step. Drawn on the
  host so the train step dispatches to a static program per modality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def corrupt_tokens(rng: jax.Array, y_in: jnp.ndarray, vocab_size: int, prob: float, pad_id: int = 0) -> jnp.ndarray:
    """[B, L] int ids -> corrupted ids."""
    if prob <= 0.0:
        return y_in
    r_mask, r_ids = jax.random.split(rng)
    flip = jax.random.uniform(r_mask, y_in.shape) < prob
    non_pad = y_in != pad_id
    random_ids = jax.random.randint(r_ids, y_in.shape, 0, vocab_size, dtype=y_in.dtype)
    return jnp.where(flip & non_pad, random_ids, y_in)


def draw_modality(rng: np.random.Generator, prob: float) -> str:
    """Host-side modality-dropout draw: 'image' | 'audio' | 'both'."""
    if rng.random() < prob:
        return "image" if rng.random() < 0.5 else "audio"
    return "both"
