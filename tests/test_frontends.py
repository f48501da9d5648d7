"""Frontend parity tests: numpy STFT vs torch.stft (librosa-equivalent
settings), JAX batched STFT vs numpy path, image preprocessing."""

import numpy as np
import pytest

from omr_a2s_multimodal_transformer_tpu.ops import stft as S


def _wave(n=22050, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 22050.0
    return (np.sin(2 * np.pi * 440 * t) + 0.3 * rng.standard_normal(n)).astype(np.float32)


def test_magnitude_stft_matches_torch():
    torch = pytest.importorskip("torch")
    y = _wave()
    ours = S.magnitude_stft_np(y)
    win = torch.hann_window(2048, periodic=True, dtype=torch.float64)
    ref = torch.stft(
        torch.tensor(y, dtype=torch.float64),
        n_fft=2048, hop_length=512, win_length=2048, window=win,
        center=True, pad_mode="constant", return_complex=True,
    ).abs().numpy()[: S.NUM_FREQ_BINS]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_log_spectrogram_range_and_shape():
    y = _wave()
    spec = S.log_spectrogram_np(y)
    assert spec.shape[0] == 195
    assert spec.shape[1] == 1 + len(y) // 512
    assert spec.min() >= -1e-6 and spec.max() <= 1.0 + 1e-6  # [0,1] up to float error (reference doesn't clamp either)
    assert abs(spec.max() - 1.0) < 1e-6  # ref=max -> peak exactly 1


def test_jax_log_spectrogram_matches_numpy():
    y1, y2 = _wave(22050, 1), _wave(11025, 2)
    L = len(y1)
    batch = np.zeros((2, L), np.float32)
    batch[0] = y1
    batch[1, : len(y2)] = y2
    out = np.asarray(S.log_spectrogram(batch, np.asarray([len(y1), len(y2)], np.int32)))
    ref1 = S.log_spectrogram_np(y1)
    ref2 = S.log_spectrogram_np(y2)
    # Near the -80 dB floor, float32 cancellation noise amplifies in log scale;
    # compare tightly only above it (>0.1 == >-72 dB), loosely elsewhere.
    def close(a, b):
        mask = b > 0.1
        np.testing.assert_allclose(a[mask], b[mask], atol=2e-3)
        np.testing.assert_allclose(a, b, atol=0.12)

    close(out[0], ref1)
    t2 = ref2.shape[1]
    close(out[1, :, :t2], ref2)
    # padded frames come out at exactly the collate pad value (0.0)
    assert np.all(out[1, :, t2:] == 0.0)


def test_preprocess_image_resize_and_scale():
    from PIL import Image

    from omr_a2s_multimodal_transformer_tpu.data.frontends import preprocess_image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (100, 300), np.uint8))
    x = preprocess_image.__wrapped__(img) if hasattr(preprocess_image, "__wrapped__") else preprocess_image(img)
    assert x.shape == (1, 100, 300) and 0 <= x.min() and x.max() <= 1
    x2 = preprocess_image.func(img, 50) if hasattr(preprocess_image, "func") else preprocess_image(img, 50)
    assert x2.shape == (1, 50, 150)  # aspect preserved: 300 * 50/100


def test_num_freq_bins_is_195():
    assert S.NUM_FREQ_BINS == 195


def test_cache_read_failure_degrades_to_recompute(tmp_path, monkeypatch):
    """A joblib entry whose payload vanished (concurrent loader race /
    disk-full interruption) must trigger a recompute, not crash the input
    pipeline (KeyError 'Non-existing item')."""
    import glob
    import os

    import numpy as np

    from omr_a2s_multimodal_transformer_tpu.data import frontends

    if frontends.MEMORY is None:
        return  # uncached environment: nothing to break

    wave = np.sin(np.linspace(0, 100, 2205)).astype(np.float32)
    first = frontends.preprocess_audio(wave, 22050.0)

    # destroy THIS entry's stored payload (and only this entry's — the
    # cache is shared state) while keeping its directory + metadata
    backend = frontends.preprocess_audio.cache_backend
    args_id = backend._get_args_id(wave, 22050.0)
    out_pkl = os.path.join(frontends.MEMORY.store_backend.location,
                           backend.func_id, args_id, "output.pkl")
    assert os.path.exists(out_pkl), out_pkl
    os.remove(out_pkl)

    again = frontends.preprocess_audio(wave, 22050.0)
    np.testing.assert_array_equal(np.asarray(first), np.asarray(again))
