"""End-to-end on-device transcription pipelines (serving path).

One jitted program per modality: raw inputs (uint8 score images / 22.05 kHz
waveforms) -> device frontends (ops/image.py, ops/stft.py) -> conv-stem
encode -> KV-cached greedy decode -> token ids. This is the
"preprocess+encode+decode" unit the BASELINE metric measures; the reference
splits it across host librosa/PIL, Lightning, and a per-sample Python loop.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from omr_a2s_multimodal_transformer_tpu.ops.image import preprocess_image_batch
from omr_a2s_multimodal_transformer_tpu.ops.stft import HOP_LENGTH, NUM_FREQ_BINS, log_spectrogram
from omr_a2s_multimodal_transformer_tpu.training.decode import greedy_decode_fn, weighted_decode_fn


def make_image_transcriber(
    model, sos_id: int, eos_id: int, img_height: Optional[int] = None
) -> Callable:
    """f(params, raw_u8 [B,H,W], hw [B,2]) -> (tokens [B,L], scores)."""
    decode = greedy_decode_fn(model, model.max_seq_len, sos_id, eos_id)

    @jax.jit
    def transcribe(params, raw, hw):
        x, hw2 = preprocess_image_batch(raw, hw, target_height=img_height)
        return decode(params, x, hw2)

    return transcribe


def make_audio_transcriber(model, sos_id: int, eos_id: int) -> Callable:
    """f(params, wave [B,L] f32, n_samples [B]) -> (tokens [B,L], scores)."""
    decode = greedy_decode_fn(model, model.max_seq_len, sos_id, eos_id)

    @jax.jit
    def transcribe(params, wave, n_samples):
        # Spectrograms are laid out [bins(height), frames(width)] like the
        # reference; NHWC adds the trailing channel.
        spec = log_spectrogram(wave, n_samples)  # [B, bins, T]
        x = spec[..., None]
        frames = 1 + n_samples // HOP_LENGTH
        hw = jnp.stack([jnp.full_like(frames, NUM_FREQ_BINS), frames], axis=1)
        return decode(params, x, hw)

    return transcribe


def make_multimodal_transcriber(
    model, sos_id: int, eos_id: int, img_height: Optional[int] = None
) -> Callable:
    """f(params, raw_img_u8, img_hw, wave, n_samples) -> (tokens, scores)."""
    decode = greedy_decode_fn(model, model.max_seq_len, sos_id, eos_id, multimodal=True)

    @jax.jit
    def transcribe(params, raw_img, img_hw, wave, n_samples):
        xi, hwi = preprocess_image_batch(raw_img, img_hw, target_height=img_height)
        spec = log_spectrogram(wave, n_samples)
        xa = spec[..., None]
        frames = 1 + n_samples // HOP_LENGTH
        hwa = jnp.stack([jnp.full_like(frames, NUM_FREQ_BINS), frames], axis=1)
        return decode(params, xi, hwi, xa, hwa)

    return transcribe


def make_fused_transcriber(
    img_model, audio_model, sos_id: int, eos_id: int, img_height: Optional[int] = None
) -> Callable:
    """Weighted late-fusion serving path: two unimodal models decoded in
    lockstep, next-token dist = alpha*softmax(img) + (1-alpha)*softmax(audio)
    (reference weighted_multimodal/test.py:21-70 — there an offline eval
    loop; here one jitted preprocess+encode+decode program).

    f(img_params, audio_params, raw_img_u8 [B,H,W], img_hw [B,2],
      wave [B,N] f32, n_samples [B], alpha) -> (tokens [B,L], scores).
    alpha is a traced scalar: one compiled program serves every mix weight.
    """
    decode = weighted_decode_fn(
        img_model, audio_model, img_model.max_seq_len, sos_id, eos_id)

    @jax.jit
    def transcribe(img_params, audio_params, raw_img, img_hw, wave, n_samples, alpha):
        xi, hwi = preprocess_image_batch(raw_img, img_hw, target_height=img_height)
        spec = log_spectrogram(wave, n_samples)
        xa = spec[..., None]
        frames = 1 + n_samples // HOP_LENGTH
        hwa = jnp.stack([jnp.full_like(frames, NUM_FREQ_BINS), frames], axis=1)
        return decode(img_params, audio_params, xi, hwi, xa, hwa, alpha)

    return transcribe
