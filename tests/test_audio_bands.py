"""'bands' audio style: separable, exactly peak-decodable note encoding.

The default 'tones' style is information-lossy ((rank,+1) aliases
(rank+1,-1); 17 ranks alias voices an octave apart; low-pitch semitones
fall under the 10.77 Hz STFT bin width) — the measured audio-only SER
ceiling of ~45 at corpus scale. 'bands' places every (simultaneity group,
rank, acc) at a unique exact STFT bin center in one of three disjoint
bands, so the corpus provably carries the tokens: this file ROUNDTRIPS the
rendered wave back to the parsed events through the production STFT
frontend (ops/stft.py) with nothing smarter than a per-band argmax.

Reference parity note: the synthetic corpus is this repo's test fixture
generator (the reference trains on GRANDSTAFF; no counterpart file).
"""

import numpy as np

from omr_a2s_multimodal_transformer_tpu.data.sources import (
    _PITCHES,
    _parse_kern_events,
    bands_tone_bin,
    render_score_audio,
    synthetic_kern,
)
from omr_a2s_multimodal_transformer_tpu.ops import stft


def test_bands_bins_injective_and_in_band():
    seen = {}
    for group_v, ci in ((0, 0), (1, 0), (1, 1)):
        for rank in range(len(_PITCHES)):
            for acc in (-1, 0, 1):
                b = bands_tone_bin(group_v, ci, rank, acc)
                assert 15 <= b <= stft.NUM_FREQ_BINS - 1, b
                key = (group_v, ci, rank, acc)
                assert b not in seen.values(), (key, b, seen)
                seen[key] = b
    # groups occupy disjoint 60-bin bands
    assert max(bands_tone_bin(0, 0, r, a) for r in range(17) for a in (-1, 0, 1)) < 75
    assert min(bands_tone_bin(1, 0, r, a) for r in range(17) for a in (-1, 0, 1)) >= 75


def test_bands_roundtrip_exact_through_production_stft():
    rng = np.random.default_rng(7)
    transcript = synthetic_kern(rng, n_measures=3, notes_per_measure=4)
    events = _parse_kern_events(transcript)
    secs = 0.4 * len(events)  # slot 0.4 s >> the 93 ms analysis window
    wave = render_score_audio(transcript, secs, style="bands")
    mag = stft.magnitude_stft_np(wave)  # [bins, T]
    sr, hop = stft.SAMPLE_RATE, stft.HOP_LENGTH
    slot = secs / len(events)

    bands = {0: (15, 75), 1: (75, 135), 2: (135, 195)}
    n_notes = 0
    for e, (kind, payload) in enumerate(events):
        if kind != "notes":
            continue
        # a frame centered ~15% into the slot is inside the on-region of
        # every duration class (min on-fraction 0.3) with the full window
        # clear of the slot boundaries (0.15*0.4s=60ms >> 46.5ms half-window
        # ... not quite; use 0.15*slot and rely on the dominant-energy tone)
        center = int((e + 0.15) * slot * sr)
        f = int(round(center / hop))
        frame = mag[:, f]
        expected = {}  # band index -> bin
        for v, notes in enumerate(payload):
            for ci, (dur, rank, acc) in enumerate(notes):
                g = 0 if v == 0 else 1 + min(ci, 1)
                expected[g] = bands_tone_bin(v, ci, rank, acc)
        for g, (lo, hi) in bands.items():
            band_mag = frame[lo:hi]
            if g in expected:
                got = lo + int(np.argmax(band_mag))
                assert got == expected[g], (e, g, got, expected[g])
                n_notes += 1
            else:
                # silent band: no peak anywhere near a tone's level
                if expected:
                    ref_g = next(iter(expected))
                    ref_lo, ref_hi = bands[ref_g]
                    assert band_mag.max() < 0.3 * frame[ref_lo:ref_hi].max()
    assert n_notes >= 10  # the transcript actually exercised the decoder


def test_tones_style_is_default_and_unchanged():
    rng = np.random.default_rng(1)
    tr = synthetic_kern(rng, n_measures=1)
    a = render_score_audio(tr, 1.0)
    b = render_score_audio(tr, 1.0, style="tones")
    np.testing.assert_array_equal(a, b)
    c = render_score_audio(tr, 1.0, style="bands")
    assert np.abs(a - c).max() > 0  # genuinely different encodings
