"""Fusion tests: Smith-Waterman policy truth table (reference
smith_waterman.py:147-158), native/python agreement, seq2kern round-trip."""

import numpy as np

from omr_a2s_multimodal_transformer_tpu.data.encoding import KrnParser
from omr_a2s_multimodal_transformer_tpu.fusion.smith_waterman import (
    _sw_native,
    _sw_python,
    align_tokens,
    fuse_predictions,
)
from omr_a2s_multimodal_transformer_tpu.utils.mv2h import seq2kern_lines


def test_fusion_match_keeps_token():
    a = list("abcdef")
    assert fuse_predictions(a, [1] * 6, a, [1] * 6) == a


def test_fusion_mismatch_highest_prob_wins_query_ties():
    r, q = list("abXd"), list("abYd")
    assert fuse_predictions(r, [1, 1, 0.9, 1], q, [1, 1, 0.2, 1]) == list("abXd")
    assert fuse_predictions(r, [1, 1, 0.2, 1], q, [1, 1, 0.9, 1]) == list("abYd")
    # tie -> query (reference: qv if qv_prob >= rv_prob)
    assert fuse_predictions(r, [1, 1, 0.5, 1], q, [1, 1, 0.5, 1]) == list("abYd")


def test_fusion_gap_takes_present_token():
    r, q = list("abcde"), list("abde")
    assert fuse_predictions(r, [1] * 5, q, [1] * 4) == list("abcde")
    assert fuse_predictions(q, [1] * 4, r, [1] * 5) == list("abcde")


def test_native_matches_python_affine():
    rng = np.random.default_rng(1)
    for _ in range(30):
        r = rng.integers(0, 4, rng.integers(1, 25)).astype(np.int32)
        q = rng.integers(0, 4, rng.integers(1, 25)).astype(np.int32)
        for scores in [(2, -1, -1, -1), (10, 5, -2, -1), (5, 2, -4, -1)]:
            assert _sw_native(r, q, *scores) == _sw_python(r, q, *scores)


def test_align_tokens_no_vocab_limit():
    # the reference asserts per-pair vocab < 214 (smith_waterman.py:25-27);
    # we align arbitrary vocabularies
    r = [f"tok{i}" for i in range(500)]
    cigar, ri, qi = align_tokens(r, r)
    assert sum(c for op, c in cigar if op == 0) == len(r) + 0  # all matches


def test_seq2kern_roundtrip():
    parser = KrnParser(encoding="kern")
    # encode -> reconstruct -> re-encode must be stable up to the last <cor>
    # (the reference's seq2kern flushes lines only on <cor> and drops the
    # trailing event, metrics.py:253-279 — we preserve that behavior).
    toks = parser.encode("**kern\t**kern\n*clefF4\t*clefG2\n4C 4E\t4cc\n8D\t.\n=1\t=1\n")
    lines = seq2kern_lines(toks)
    assert lines[0].startswith("**kern")
    last_cor = len(toks) - 1 - toks[::-1].index("<cor>")
    re_toks = parser.encode("\n".join(lines))
    assert re_toks == toks[:last_cor]
