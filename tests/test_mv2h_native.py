"""Native MV2H (utils/mv2h_native.py): kern interpreter + the five metric
components behave per the MV2H definition (McLeod & Steedman 2018).
Reference capability: src/utils/metrics.py:94-338 (music21+pyMV2H
pipeline, not installable here)."""

import numpy as np
import pytest

from omr_a2s_multimodal_transformer_tpu.data.encoding import KrnParser
from omr_a2s_multimodal_transformer_tpu.data.sources import synthetic_kern
from omr_a2s_multimodal_transformer_tpu.utils.mv2h import seq2kern_lines
from omr_a2s_multimodal_transformer_tpu.utils.mv2h_native import (
    QUARTER_S,
    compute_mv2h_metrics_native,
    kern_to_notes,
    mv2h_from_kern_lines,
)

KERN = [
    "**kern\t**kern",
    "=1\t=1",
    "4C\t4c 4e",
    "4D\t8f",
    ".\t8g",
    "=2\t=2",
    "2E\t2cc#",
    "[4F\t4r",
    "4F]\t4b-",
    "=3\t=3",
]


def test_kern_to_notes_times_pitches_ties():
    notes, bars, total = kern_to_notes(KERN)
    by = {(n.pitch, round(n.onset, 3)): n for n in notes}
    q = QUARTER_S
    # spine 0 (bass): C3 at 0, D3 at q, E3 (half note) at 2q,
    # tied F3 at 4q lasting 2q
    assert (48, 0.0) in by and (50, round(q, 3)) in by
    assert (52, round(2 * q, 3)) in by
    f3 = by[(53, round(4 * q, 3))]
    assert abs(f3.duration - 2 * q) < 1e-9, "tie not merged"
    # spine 1: chord c4+e4 at 0; f4 at q, g4 at 1.5q; cc# (C#5+1=73, half)
    # at 2q; rest at 4q (advances time only); b-4 at 5q
    assert (60, 0.0) in by and (64, 0.0) in by
    assert (65, round(q, 3)) in by and (67, round(1.5 * q, 3)) in by
    assert (73, round(2 * q, 3)) in by
    assert (70, round(5 * q, 3)) in by
    # rests produce no notes but advance time; 3 barlines
    assert len(bars) == 3
    assert total == pytest.approx(6 * q)


def test_identity_scores_one():
    res = mv2h_from_kern_lines(KERN, KERN)
    for k in ("multi-pitch", "voice", "meter", "note_value", "mv2h"):
        assert res[k] == pytest.approx(1.0), (k, res)
    assert res["harmony"] is None


def test_pitch_errors_hit_multi_pitch():
    wrong = [ln.replace("4D", "4E") for ln in KERN]
    res = mv2h_from_kern_lines(KERN, wrong)
    assert res["multi-pitch"] < 1.0
    assert res["meter"] == pytest.approx(1.0)


def test_duration_errors_hit_note_value():
    wrong = [ln.replace("2E", "4E") for ln in KERN]  # halve a duration
    res = mv2h_from_kern_lines(KERN, wrong)
    assert res["note_value"] < 1.0
    # pitch+onset unchanged for that note -> multi-pitch still 1 (next-note
    # onsets shift though, so allow matching to degrade there)
    assert res["multi-pitch"] > 0.5


def test_voice_grouping_is_label_invariant():
    # swapping WHOLE spines relabels voices but keeps the grouping — the
    # MV2H voice score is a grouping F1, so it must stay 1.0
    swapped = []
    for ln in KERN:
        cols = ln.split("\t")
        swapped.append("\t".join(cols[::-1]) if len(cols) == 2 else ln)
    res = mv2h_from_kern_lines(KERN, swapped)
    assert res["multi-pitch"] == pytest.approx(1.0)
    assert res["voice"] == pytest.approx(1.0)


def test_moving_a_note_across_voices_hits_voice():
    # reassign D3 from the bass spine into the treble spine (same onset,
    # same pitch -> multi-pitch keeps matching it; grouping breaks)
    moved = [ln.replace("4D\t8f", ".\t8f 4D") for ln in KERN]
    res = mv2h_from_kern_lines(KERN, moved)
    assert res["voice"] < 1.0
    # the moved quarter note also stretches the treble chord slot, shifting
    # later onsets out of tolerance — multi-pitch degrades but stays > 0
    assert 0.3 < res["multi-pitch"] < 1.0


def test_missing_barline_hits_meter():
    nobar = [ln for ln in KERN if not ln.startswith("=2")]
    res = mv2h_from_kern_lines(KERN, nobar)
    assert res["meter"] < 1.0


def test_empty_prediction():
    res = mv2h_from_kern_lines(KERN, ["**kern\t**kern"])
    assert res["multi-pitch"] == 0.0
    assert res["mv2h"] < 0.7


def test_corpus_level_on_tokenizer_output():
    """Round-trip through the production tokenizer: encode synthetic kern,
    rebuild with seq2kern_lines, score. GT vs itself = 1; GT vs a different
    piece < 1."""
    rng = np.random.default_rng(0)
    parser = KrnParser("kern")
    a = parser.encode(synthetic_kern(rng, n_measures=2))
    b = parser.encode(synthetic_kern(np.random.default_rng(5), n_measures=2))
    out = compute_mv2h_metrics_native([a, a], [a, b])
    assert 0.0 < out["mv2h"] < 1.0
    assert out["harmony"] is None
    perfect = compute_mv2h_metrics_native([a], [a])
    assert perfect["mv2h"] == pytest.approx(1.0)
    assert perfect["multi-pitch"] == pytest.approx(1.0)


def test_garbage_contributes_zero():
    a = ["4c", "<cor>", "4d"]
    out = compute_mv2h_metrics_native([a], [["<con>"] * 3])
    assert out["mv2h"] < 1.0  # no crash, degraded score
