"""Evaluation metrics: Symbol/Sequence Error Rate (+ optional MV2H).

Parity with the reference (``/root/reference/src/utils/metrics.py``):
- sym-er = 100 * sum(edit_distance) / sum(len(ground_truth))
- seq-er = 100 * (#sequences with any error) / #sequences
- MV2H via kern reconstruction -> music21 MIDI -> pyMV2H (optional deps,
  off by default exactly like the reference's compute_mv2h=False).

The Levenshtein DP is vectorized with numpy over interned token ids (a C++
kernel in ``native/`` is used when built — see utils/edit_distance.py);
the reference uses a pure-Python nested loop.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from omr_a2s_multimodal_transformer_tpu.utils.edit_distance import levenshtein


def compute_ed_metrics(y_true: Sequence[List[str]], y_pred: Sequence[List[str]]) -> Dict[str, float]:
    ed_acc = 0
    length_acc = 0
    wrong_seqs = 0
    for t, h in zip(y_true, y_pred):
        ed = levenshtein(t, h)
        ed_acc += ed
        length_acc += len(t)
        if ed > 0:
            wrong_seqs += 1
    return {
        "sym-er": 100.0 * ed_acc / max(length_acc, 1),
        "seq-er": 100.0 * wrong_seqs / max(len(y_pred), 1),
    }


def compute_metrics(
    y_true: Sequence[List[str]],
    y_pred: Sequence[List[str]],
    compute_mv2h: bool = False,
) -> Dict[str, float]:
    metrics = compute_ed_metrics(y_true, y_pred)
    if compute_mv2h:
        # Prefer the reference pipeline (music21 + pyMV2H) when installed;
        # otherwise fall back to the dependency-free native implementation
        # (utils/mv2h_native.py — same published metric, no MIDI round-trip).
        try:
            from omr_a2s_multimodal_transformer_tpu.utils.mv2h import compute_mv2h_metrics

            metrics.update(compute_mv2h_metrics(y_true, y_pred))
        except ImportError:
            import logging

            from omr_a2s_multimodal_transformer_tpu.utils.mv2h_native import (
                compute_mv2h_metrics_native,
            )

            logging.getLogger(__name__).warning(
                "music21/pyMV2H not installed: scoring MV2H with the native "
                "implementation (utils/mv2h_native.py; harmony undefined on kern)"
            )
            metrics.update({k: v for k, v in compute_mv2h_metrics_native(y_true, y_pred).items()
                            if v is not None})
    return metrics
