"""Unit tests for the tones-audio error decomposition
(tools/diagnose_audio_errors.py, VERDICT r4 #3): the line classifier must
put provable ambiguity-class confusions (quarter-tone aliases, chord-order
swaps) in the audio_identical bucket and audible mistakes in the model-
deficit buckets."""

import sys

sys.path.insert(0, ".")

from omr_a2s_multimodal_transformer_tpu.data import sources
from tools.diagnose_audio_errors import (
    classify_line_pair,
    decompose,
    lines_from_tokens,
    parse_token,
    tones_f0,
)

P = sources._PITCHES


def _line(toks):
    lines = lines_from_tokens(toks + ["<cor>"], P)
    assert len(lines) == 1
    return lines[0]


def test_parse_token():
    assert parse_token("16b#", P) == (16, P.index("b"), 1)
    assert parse_token("4cc-", P) == (4, P.index("cc"), -1)
    assert parse_token("2G", P) == (2, P.index("G"), 0)
    assert parse_token("DOT", P) is None
    assert parse_token("=", P) is None
    assert parse_token("<coc>", P) is None


def test_quarter_tone_alias_is_audio_identical():
    # (rank, +1) and (rank+1, -1) render the same f0 exactly (sources.py:342)
    r = 3
    assert tones_f0(0, r, 1) == tones_f0(0, r + 1, -1)
    g = _line([f"4{P[r]}#", "<coc>", "4a"])
    p = _line([f"4{P[r + 1]}-", "<coc>", "4a"])
    assert classify_line_pair(g, p) == "audio_identical"


def test_chord_order_swap_is_audio_identical():
    g = _line(["DOT", "<coc>", "16b#", "<con>", "8ee-"])
    p = _line(["DOT", "<coc>", "8ee-", "<con>", "16b#"])
    assert classify_line_pair(g, p) == "audio_identical"


def test_duration_error():
    g = _line(["4a", "<coc>", "4c"])
    p = _line(["8a", "<coc>", "4c"])
    assert classify_line_pair(g, p) == "duration_error"


def test_structure_error():
    g = _line(["DOT", "<coc>", "4c"])
    p = _line(["4a", "<coc>", "4c"])
    assert classify_line_pair(g, p) == "structure_error"


def test_audible_pitch_error():
    g = _line(["4a", "<coc>", "4c"])
    p = _line(["4d", "<coc>", "4c"])
    assert classify_line_pair(g, p) == "pitch_error"


def test_decompose_masses():
    g = ["4a", "<coc>", "16b#", "<con>", "8ee-", "<cor>", "=", "<coc>", "=", "<cor>"]
    p = ["4a", "<coc>", "8ee-", "<con>", "16b#", "<cor>", "=", "<coc>", "=", "<cor>"]
    mass, per = decompose([(g, p)], P)
    assert mass["audio_identical"] > 0
    assert mass.get("pitch_error", 0) == 0
    # identical streams -> no error mass
    mass2, _ = decompose([(g, g)], P)
    assert sum(mass2.values()) == 0
