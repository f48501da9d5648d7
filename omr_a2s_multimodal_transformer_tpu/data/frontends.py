"""Host-side image/audio frontends (parity path) + disk cache.

Mirrors ``/root/reference/src/data/preprocessing.py:17-52``:
- image: grayscale, optional aspect-preserving resize to a target height,
  scale to [0, 1]; output [1, H, W] float32.
- audio: resample to 22.05 kHz, band-limited log-STFT in [0, 1];
  output [1, 195, T] float32.

These run in the input pipeline on the host and are memoized to disk.
The batched on-device equivalents live in ``ops.stft`` (audio) and
``ops.image`` (resize/normalize); the host versions define bit-parity.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from omr_a2s_multimodal_transformer_tpu.ops.stft import log_spectrogram_np

NUM_CHANNELS = 1
AUDIO_HEIGHT = NUM_FREQ_BINS = 195

_CACHE_DIR = os.environ.get("OMR_A2S_CACHE_DIR", "./joblib_cache")

try:  # joblib is optional; without it frontends are uncached.
    import functools

    import joblib

    MEMORY = joblib.memory.Memory(_CACHE_DIR, mmap_mode="r", verbose=0)

    def _cached(fn):
        cached_fn = MEMORY.cache(fn)

        @functools.wraps(fn)
        def robust(*args, **kwargs):
            # joblib raises KeyError ("Non-existing item (may have been
            # cleared)") when an entry's metadata exists but its payload is
            # gone or mid-write — seen under concurrent multi-process
            # loaders sharing one cache and after a disk-full interruption.
            # A cache-read failure must degrade to a recompute, never crash
            # the input pipeline.
            try:
                return cached_fn(*args, **kwargs)
            except KeyError:
                return fn(*args, **kwargs)

        robust.cache_backend = cached_fn
        return robust

except Exception:  # pragma: no cover
    MEMORY = None

    def _cached(fn):
        return fn


def clear_cache() -> None:
    if MEMORY is not None:
        MEMORY.clear(warn=False)


@_cached
def preprocess_audio(raw_audio: np.ndarray, sr: float) -> np.ndarray:
    """Waveform -> [1, NUM_FREQ_BINS, T] float32 log-spectrogram in [0, 1]."""
    x = log_spectrogram_np(np.asarray(raw_audio, np.float32), sr=sr)
    return x[None, ...].astype(np.float32)


@_cached
def preprocess_image(raw_image, img_height: Optional[int] = None) -> np.ndarray:
    """PIL image -> [1, H, W] float32 in [0, 1].

    Grayscale conversion and (optional) aspect-preserving resize use PIL with
    its default (bicubic) resampling — same calls as the reference
    (preprocessing.py:44-52) so pixel values match bit-for-bit.
    """
    x = raw_image.convert("L")
    if img_height is not None:
        new_width = int(img_height * x.size[0] / x.size[1])
        x = x.resize((new_width, img_height))
    arr = np.asarray(x, dtype=np.float32) / 255.0
    return arr[None, ...]


def image_from_array(arr: np.ndarray):
    """Helper: uint8 HxW / HxWx3 array -> PIL image (for synthetic data)."""
    from PIL import Image

    return Image.fromarray(arr)
