"""Native kern -> WAV synthesis (data/synth.py) + the dataset-prep glue.

Closes the last executable gap in the audio-synthesis stage (SURVEY §2 #2):
the reference pipeline (music21 + FluidSynth, reference
src/data/prepare_dataset.py:100-162) cannot run in this environment, so the
native engine must actually produce real WAV files with the score's
pitch/onset structure, and prepare_dataset.synthesize_audio(engine='native')
must reproduce the reference's error-logging + sibling-deletion semantics.
"""

import os
import wave as wave_mod

import numpy as np
import pytest

from omr_a2s_multimodal_transformer_tpu.data.prepare_dataset import synthesize_audio
from omr_a2s_multimodal_transformer_tpu.data.sources import synthetic_kern
from omr_a2s_multimodal_transformer_tpu.data.synth import (
    kern_lines_to_wave,
    render_kern_to_wav,
)

SR = 22050


def _fft_peak_hz(x: np.ndarray, sr: int) -> float:
    spec = np.abs(np.fft.rfft(x * np.hanning(x.size)))
    return float(np.argmax(spec) * sr / x.size)


def test_single_note_pitch_and_duration():
    # middle C quarter note at 120 bpm = 261.63 Hz for 0.5 s
    lines = ["**kern", "*clefG2", "=1", "4c", "*-"]
    w = kern_lines_to_wave(lines, SR)
    assert w.dtype == np.float32
    assert np.all(np.isfinite(w))
    # nominal 0.5 s + release tail
    assert 0.5 * SR <= w.size <= 1.1 * SR
    peak = _fft_peak_hz(w[: int(0.4 * SR)], SR)
    assert abs(peak - 261.63) < 8.0, peak


def test_two_voices_and_onsets():
    # bass whole note + treble note starting at beat 3 (t=1.0 s)
    lines = ["**kern\t**kern", "=1\t=1", "1C\t2r", ".\t2a", "*-\t*-"]
    w = kern_lines_to_wave(lines, SR)
    # energy present in the late (a4-only, C decayed) region at 440 Hz
    late = w[int(1.05 * SR): int(1.45 * SR)]
    assert _fft_peak_hz(late, SR) == pytest.approx(440.0, abs=10.0)
    # early region dominated by C2 (65.4 Hz) fundamental or low partials
    early = w[: int(0.5 * SR)]
    assert _fft_peak_hz(early, SR) < 300.0


def test_synthetic_corpus_renders():
    rng = np.random.default_rng(7)
    lines = synthetic_kern(rng, n_measures=3).splitlines()
    w = kern_lines_to_wave(lines, SR)
    assert np.all(np.isfinite(w))
    assert float(np.max(np.abs(w))) > 0.01
    assert float(np.max(np.abs(w))) <= 0.9 + 1e-6


def test_unparseable_kern_raises():
    with pytest.raises(ValueError, match="no parseable notes"):
        kern_lines_to_wave(["**kern", "*-"], SR)


def test_wav_file_roundtrip_and_frontend(tmp_path):
    krn = tmp_path / "x.krn"
    krn.write_text("**kern\n=1\n4c\n4d\n4e\n4f\n*-\n")
    wav = tmp_path / "x.wav"
    render_kern_to_wav(str(krn), str(wav), SR)
    with wave_mod.open(str(wav)) as f:
        assert f.getframerate() == SR
        assert f.getnchannels() == 1
        assert f.getsampwidth() == 2
        n = f.getnframes()
        pcm = np.frombuffer(f.readframes(n), np.int16)
    assert n > SR  # 4 quarter notes = 2 s nominal
    assert int(np.abs(pcm).max()) > 1000  # real signal, not silence
    # the audio frontend must accept the rendered audio
    from omr_a2s_multimodal_transformer_tpu.data.frontends import preprocess_audio

    feats = preprocess_audio(pcm.astype(np.float32) / 32767.0, SR)
    assert np.all(np.isfinite(np.asarray(feats)))


def test_prepare_dataset_native_engine(tmp_path):
    # composer tree with one good and one broken kern + sibling modalities
    c = tmp_path / "bach"
    for sub in ("krn", "img", "img_distorted", "bekrn", "wav"):
        (c / sub).mkdir(parents=True)
    (c / "krn" / "good.krn").write_text("**kern\n=1\n4c 4e 4g\n*-\n")
    (c / "img" / "good.jpg").write_bytes(b"jpg")
    (c / "krn" / "bad.krn").write_text("**kern\n*-\n")
    (c / "img" / "bad.jpg").write_bytes(b"jpg")
    (c / "bekrn" / "bad.bekrn").write_text("x")

    errors = synthesize_audio(str(tmp_path), engine="native")

    assert (c / "wav" / "good.wav").exists()
    assert not (c / "wav" / "bad.wav").exists()
    # reference semantics: failed sample removed across modalities, logged
    assert not (c / "krn" / "bad.krn").exists()
    assert not (c / "img" / "bad.jpg").exists()
    assert not (c / "bekrn" / "bad.bekrn").exists()
    assert (c / "krn" / "good.krn").exists()
    assert (c / "img" / "good.jpg").exists()
    assert "bach" in errors and len(errors["bach"]) == 1
    assert os.path.exists(tmp_path / "errors" / "bach.txt")


def test_engine_auto_falls_back_to_native(tmp_path, monkeypatch):
    # Force the ImportError branch regardless of what's installed (ADVICE r3:
    # in an env WITH music21/midi2audio this would otherwise silently
    # exercise the fluidsynth path instead of the fallback it claims to test).
    import builtins

    real_import = builtins.__import__

    def no_midi_deps(name, *a, **k):
        if name in ("midi2audio", "music21"):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_midi_deps)
    c = tmp_path / "mozart"
    (c / "krn").mkdir(parents=True)
    (c / "wav").mkdir()
    (c / "krn" / "p.krn").write_text("**kern\n=1\n2g\n*-\n")
    synthesize_audio(str(tmp_path), engine="auto")
    assert (c / "wav" / "p.wav").exists()
    # the engine resolution is recorded for mixed-corpus detection
    assert (tmp_path / ".synthesis_engine").read_text().strip() == "native"


def test_bad_engine_rejected(tmp_path):
    with pytest.raises(ValueError, match="unknown engine"):
        synthesize_audio(str(tmp_path), engine="sox")
