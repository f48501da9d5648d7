"""Log-amplitude STFT frontend as a TPU-friendly matmul kernel.

The reference computes the audio frontend with librosa on the host
(``/root/reference/src/data/preprocessing.py:17-30``): STFT with
n_fft=2048, hop=512, hann window, centered with zero padding, keeps the
195 frequency bins below 2093 Hz, converts amplitude to dB relative to the
per-sample max with an 80 dB floor, and rescales to [0, 1].

TPU-native design: instead of an FFT, the band-limited DFT is expressed as
two dense matmuls ``frames @ C`` / ``frames @ S`` with precomputed
cos/sin matrices of shape [n_fft, n_bins]. With only 195 of 1025 bins kept,
this is ~2.4 MFLOP/frame — a perfect MXU shape (2048x195) — and fuses with
the windowing multiply under XLA, keeping the whole frontend on-device and
batched (the reference is per-sample host code).

The numpy path (``log_spectrogram_np``) is the bit-parity reference used by
the input pipeline on the host and by tests (cross-checked against
torch.stft, which matches librosa's constant-pad centered STFT).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 22050
N_FFT = 2048
HOP_LENGTH = 512
WIN_LENGTH = 2048
STFT_FMAX = 2093.0
# Bins with freq k*sr/n_fft <= 2093 Hz -> k = 0..194 -> 195 bins
# (reference preprocessing.py:13 NUM_FREQ_BINS = 195).
NUM_FREQ_BINS = int(math.floor(STFT_FMAX * N_FFT / SAMPLE_RATE)) + 1
AMIN = 1e-5
TOP_DB = 80.0


def hann_window(n: int = WIN_LENGTH, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (scipy ``get_window('hann', n, fftbins=True)``)."""
    k = np.arange(n)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)).astype(dtype)


@functools.lru_cache(maxsize=4)
def _dft_matrices(n_fft: int = N_FFT, n_bins: int = NUM_FREQ_BINS):
    """Cos/sin DFT analysis matrices [n_fft, n_bins] for the kept band."""
    n = np.arange(n_fft)[:, None]  # time index
    k = np.arange(n_bins)[None, :]  # bin index
    ang = 2.0 * np.pi * n * k / n_fft
    # Match FFT convention X[k] = sum_n x[n] * exp(-2j pi n k / N).
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def num_frames(num_samples: int, hop: int = HOP_LENGTH) -> int:
    """Frame count of a centered STFT: 1 + floor(len / hop)."""
    return 1 + num_samples // hop


def _frame_centered_np(y: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    pad = n_fft // 2
    ypad = np.pad(y, (pad, pad), mode="constant")
    t = 1 + (len(ypad) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(t)[:, None]
    return ypad[idx]  # [T, n_fft]


def magnitude_stft_np(y: np.ndarray) -> np.ndarray:
    """|STFT| of a 1-D signal, band-limited to NUM_FREQ_BINS. [bins, T]."""
    frames = _frame_centered_np(np.asarray(y, np.float32), N_FFT, HOP_LENGTH)
    frames = frames * hann_window()[None, :]
    c, s = _dft_matrices()
    re = frames @ c
    im = frames @ s
    return np.sqrt(re * re + im * im).T  # [bins, T]


def amplitude_to_db_np(mag: np.ndarray, amin: float = AMIN, top_db: float = TOP_DB) -> np.ndarray:
    """librosa.amplitude_to_db(S, ref=np.max): dB rel. per-array max, floored."""
    power = np.square(np.maximum(mag, amin))
    ref = np.square(max(amin, float(mag.max())))
    db = 10.0 * np.log10(power) - 10.0 * np.log10(ref)
    return np.maximum(db, db.max() - top_db)


def log_spectrogram_np(y: np.ndarray, sr: float = SAMPLE_RATE) -> np.ndarray:
    """Full reference frontend on the host: resample -> |STFT| -> dB -> [0,1].

    Returns [NUM_FREQ_BINS, T] float32 (reference
    ``get_spectrogram_from_raw_audio``, preprocessing.py:17-30).
    """
    y = np.asarray(y, dtype=np.float32)
    if int(sr) != SAMPLE_RATE:
        y = resample_np(y, int(sr), SAMPLE_RATE)
    db = amplitude_to_db_np(magnitude_stft_np(y))
    return (db / TOP_DB + 1.0).astype(np.float32)


def resample_np(y: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (GRANDSTAFF wavs are synthesized at 22.05 kHz, so
    this is an identity in the reference pipeline; provided for completeness)."""
    if orig_sr == target_sr:
        return y
    from scipy.signal import resample_poly

    g = math.gcd(orig_sr, target_sr)
    return resample_poly(y, target_sr // g, orig_sr // g).astype(np.float32)


# --------------------------------------------------------------------------
# JAX / TPU path: batched, jittable, static shapes.
# --------------------------------------------------------------------------


def _frame_centered(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """[B, L] -> [B, T, n_fft] centered frames (constant zero padding)."""
    pad = n_fft // 2
    ypad = jnp.pad(y, ((0, 0), (pad, pad)))
    t = 1 + (ypad.shape[1] - n_fft) // hop
    # Gather frames with a strided index grid; XLA lowers this to an
    # efficient dynamic-slice-free gather with static shapes.
    idx = jnp.arange(n_fft)[None, :] + hop * jnp.arange(t)[:, None]
    return ypad[:, idx]


@functools.partial(jax.jit, static_argnames=("valid_lengths_static",))
def log_spectrogram(
    wave: jnp.ndarray,
    valid_samples: jnp.ndarray | None = None,
    valid_lengths_static: bool = False,
) -> jnp.ndarray:
    """Batched log-STFT frontend on device.

    Args:
      wave: [B, L] float32 waveforms at 22.05 kHz, zero padded on the right.
      valid_samples: optional [B] int32 true lengths. The per-sample dB
        reference (max) is computed over valid frames only so right padding
        never changes the normalization (parity with the reference's
        unpadded host computation).

    Returns:
      [B, NUM_FREQ_BINS, T] float32 in [0, 1]; frames past the valid region
      come out at 0.0 — exactly the collate pad value for spectrograms.
    """
    frames = _frame_centered(wave.astype(jnp.float32), N_FFT, HOP_LENGTH)
    frames = frames * jnp.asarray(hann_window())[None, None, :]
    c, s = _dft_matrices()
    # HIGHEST precision: the default (fast bf16-pass) matmul loses ~1e-3
    # relative accuracy, which blows up near the -80 dB floor of the log scale.
    re = jnp.einsum("btn,nk->btk", frames, jnp.asarray(c), precision=jax.lax.Precision.HIGHEST)
    im = jnp.einsum("btn,nk->btk", frames, jnp.asarray(s), precision=jax.lax.Precision.HIGHEST)
    mag = jnp.sqrt(re * re + im * im)  # [B, T, bins]

    t = mag.shape[1]
    if valid_samples is not None:
        nf = 1 + valid_samples // HOP_LENGTH  # true frame counts
        frame_valid = jnp.arange(t)[None, :] < nf[:, None]  # [B, T]
        masked = jnp.where(frame_valid[..., None], mag, 0.0)
        ref = jnp.maximum(AMIN, jnp.max(masked, axis=(1, 2)))  # [B]
    else:
        frame_valid = jnp.ones((wave.shape[0], t), dtype=bool)
        ref = jnp.maximum(AMIN, jnp.max(mag, axis=(1, 2)))

    power_db = 20.0 * jnp.log10(jnp.maximum(mag, AMIN))
    db = power_db - 20.0 * jnp.log10(ref)[:, None, None]
    # per-sample max of db is 0 by construction (ref = max) -> floor at -80
    db = jnp.maximum(db, -TOP_DB)
    out = db / TOP_DB + 1.0
    out = jnp.where(frame_valid[..., None], out, 0.0)
    return jnp.transpose(out, (0, 2, 1))  # [B, bins, T]
