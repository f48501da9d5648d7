"""Audio-corpus information floor tool (tools/oracle_audio_floor.py).

The floor machinery must (a) return exactly 0 for the injective 'bands'
encoding, (b) return a nonzero floor for the collision-laden 'tones'
encoding, and (c) decode unambiguous slots exactly while resolving
collisions Bayes-optimally."""

import sys

import numpy as np

sys.path.insert(0, ".")

from omr_a2s_multimodal_transformer_tpu.data import sources
from omr_a2s_multimodal_transformer_tpu.data.encoding import KrnParser
from omr_a2s_multimodal_transformer_tpu.utils.metrics import compute_ed_metrics
from tools.oracle_audio_floor import (
    _candidate_maps,
    _f0_key,
    bayes_decode_slot,
    oracle_transcript,
)


def _floor(style, n=8, bin_quantized=False):
    src = sources.SyntheticSource(n=n, seed=3, n_measures=4, encoding="kern")
    maps = _candidate_maps(style, bin_quantized)
    parser = KrnParser("kern")
    y_true, y_pred = [], []
    for truth in src.transcripts():
        y_true.append(parser.encode(truth))
        y_pred.append(parser.encode(oracle_transcript(truth, style, maps, bin_quantized)))
    return compute_ed_metrics(y_true, y_pred)["sym-er"]


def test_bands_floor_is_zero():
    assert _floor("bands") == 0.0


def test_tones_floor_is_nonzero_and_bin_quantized_is_worse():
    exact = _floor("tones")
    binq = _floor("tones", bin_quantized=True)
    assert exact > 0.0
    assert binq >= exact


def test_unambiguous_slot_roundtrips():
    maps = _candidate_maps("tones")
    # (v=0, rank=0, acc=0) = 110 Hz collides with nothing in-voice or
    # cross-voice (voice-1 f0s start at 220 Hz; quarter-tone neighbours of
    # rank 0 are (0,+1)/(1,-1) at 113.2 Hz — distinct keys)
    f = _f0_key(0, 0, 0, 0, "tones")
    line = bayes_decode_slot([(f, 4), (_f0_key(1, 0, 5, 0, "tones"), 8)], maps)
    left, right = line.split("\t")
    assert left == "4c"
    assert right == "8a"


def test_quarter_tone_collision_resolved_not_crashed():
    maps = _candidate_maps("tones")
    # (rank=0, acc=+1) == (rank=1, acc=-1) — exact f0 collision; the
    # decoder must pick ONE of the two colliding tokens
    f = _f0_key(0, 0, 0, 1, "tones")
    assert maps[0][f] == [(0, 1), (1, -1)]
    line = bayes_decode_slot([(f, 4), (_f0_key(1, 0, 5, 0, "tones"), 8)], maps)
    assert line.split("\t")[0] in ("4c#", "4d-")


def test_chord_order_is_a_counted_ambiguity_in_tones_not_bands():
    # two distinct right-voice notes: 'tones' renders both orders
    # identically (f0 ignores chord position), 'bands' separates them
    t_a = _f0_key(1, 0, 2, 0, "tones")
    t_b = _f0_key(1, 1, 9, 0, "tones")
    assert _f0_key(1, 1, 2, 0, "tones") == t_a  # order-blind
    b_a = _f0_key(1, 0, 2, 0, "bands")
    assert _f0_key(1, 1, 2, 0, "bands") != b_a  # order-aware
    maps = _candidate_maps("tones")
    line = bayes_decode_slot([(t_a, 4), (t_b, 4)], maps)
    # the 246.9 Hz tone reads as EITHER right-voice 'e' or left-voice 'G'
    # (the exact octave collision); P(left plays)=0.8 beats P(chord)=0.3,
    # so Bayes prefers the left-voice reading — both are valid collisions
    assert line in ("4G\t4ee", "4e\t4ee", ".\t4e 4ee", ".\t4ee 4e")
