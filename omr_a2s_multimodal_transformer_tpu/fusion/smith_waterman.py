"""Smith-Waterman late fusion of image/audio predictions.

Parity target: reference ``src/multimodal/smith_waterman/``. The reference
maps tokens to single chars to fit the ``swalign`` library (vocab cap 214,
smith_waterman.py:5-11,25-27); here alignment runs directly over interned
int tokens (no vocabulary limit) in the native C++ Gotoh kernel
(``native/editdist.cpp``, affine gaps like swalign's
gap_penalty/gap_extension model) with a Python fallback.

Fusion policy (reference smith_waterman.py:118-159):
  match    -> keep the token
  mismatch -> keep the higher-probability token (query wins ties)
  gap      -> keep the token that is present
Sequences are bracketed with sentinels (prob 1) before alignment — like the
reference's "¡"/"!" — which anchors the local alignment to the full spans;
gaps get prob 0 (preprocess_prob semantics). Tokens outside the locally
aligned window are dropped, as in the reference's dump().
"""

from __future__ import annotations

import ctypes
from typing import Dict, List, Sequence, Tuple

import numpy as np

from omr_a2s_multimodal_transformer_tpu.utils.edit_distance import _load_native

_SENT_L = "\x00<sw:begin>"
_SENT_R = "\x00<sw:end>"

OP_MATCH, OP_INS, OP_DEL = 0, 1, 2  # I consumes query, D consumes ref


def _sw_python(ref: np.ndarray, query: np.ndarray, match: float, mismatch: float,
               gap_open: float, gap_extend: float) -> Tuple[List[Tuple[int, int]], int, int]:
    """Gotoh local alignment (same semantics as the C++ kernel)."""
    n, m = len(ref), len(query)
    neg = -1e30
    h = np.zeros((m + 1, n + 1))
    e = np.full((m + 1, n + 1), neg)
    f = np.full((m + 1, n + 1), neg)
    tb = np.zeros((m + 1, n + 1), np.int8)
    te = np.zeros((m + 1, n + 1), np.int8)
    tf = np.zeros((m + 1, n + 1), np.int8)
    best, bi, bj = 0.0, 0, 0
    for j in range(1, m + 1):
        for i in range(1, n + 1):
            eo, ee = h[j, i - 1] + gap_open, e[j, i - 1] + gap_extend
            e[j, i] = max(eo, ee)
            te[j, i] = 1 if ee > eo else 0
            fo, fe = h[j - 1, i] + gap_open, f[j - 1, i] + gap_extend
            f[j, i] = max(fo, fe)
            tf[j, i] = 1 if fe > fo else 0
            s = match if ref[i - 1] == query[j - 1] else mismatch
            cand = [(0.0, 0), (h[j - 1, i - 1] + s, 1), (e[j, i], 2), (f[j, i], 3)]
            v, t = max(cand, key=lambda c: (c[0], -c[1]))
            # prefer diag > E > F on exact ties, stop only if all <= 0
            v, t = 0.0, 0
            if h[j - 1, i - 1] + s > v:
                v, t = h[j - 1, i - 1] + s, 1
            if e[j, i] > v:
                v, t = e[j, i], 2
            if f[j, i] > v:
                v, t = f[j, i], 3
            h[j, i], tb[j, i] = v, t
            if v > best:
                best, bi, bj = v, i, j
    cigar: List[Tuple[int, int]] = []

    def push(op):
        if cigar and cigar[-1][0] == op:
            cigar[-1] = (op, cigar[-1][1] + 1)
        else:
            cigar.append((op, 1))

    i, j, state = bi, bj, 0
    while i > 0 and j > 0:
        if state == 0:
            t = tb[j, i]
            if t == 0:
                break
            if t == 1:
                push(OP_MATCH); i -= 1; j -= 1
            else:
                state = t
        elif state == 2:
            push(OP_DEL)
            ext = te[j, i]
            i -= 1
            if not ext:
                state = 0
        else:
            push(OP_INS)
            ext = tf[j, i]
            j -= 1
            if not ext:
                state = 0
    cigar.reverse()
    return cigar, i, j


def _sw_native(ref: np.ndarray, query: np.ndarray, match: float, mismatch: float,
               gap_open: float, gap_extend: float):
    lib = _load_native()
    if lib is None:
        return None
    if not hasattr(lib, "_sw_configured"):
        lib.smith_waterman_i32.restype = ctypes.c_int64
        lib.smith_waterman_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib._sw_configured = True
    cap = len(ref) + len(query) + 2
    ops = np.zeros(cap, np.int32)
    counts = np.zeros(cap, np.int32)
    rp = ctypes.c_int64()
    qp = ctypes.c_int64()
    k = lib.smith_waterman_i32(
        ref.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ref),
        query.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(query),
        match, mismatch, gap_open, gap_extend,
        ops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap,
        ctypes.byref(rp), ctypes.byref(qp),
    )
    if k < 0:
        return None
    return [(int(ops[x]), int(counts[x])) for x in range(k)], int(rp.value), int(qp.value)


def align_tokens(
    ref_tokens: Sequence[str],
    query_tokens: Sequence[str],
    match: float = 2,
    mismatch: float = -1,
    gap_open: float = -1,
    gap_extend: float = -1,
) -> Tuple[List[Tuple[int, int]], int, int]:
    """Local alignment over token sequences -> (cigar, ref_start, query_start)."""
    table: Dict[str, int] = {}
    def intern(seq):
        out = np.empty(len(seq), np.int32)
        for i, t in enumerate(seq):
            out[i] = table.setdefault(t, len(table))
        return out

    r, q = intern(ref_tokens), intern(query_tokens)
    res = _sw_native(r, q, match, mismatch, gap_open, gap_extend)
    if res is None:
        res = _sw_python(r, q, match, mismatch, gap_open, gap_extend)
    return res


def fuse_predictions(
    ref_tokens: List[str],
    ref_probs: List[float],
    query_tokens: List[str],
    query_probs: List[float],
    match: float = 2,
    mismatch: float = -1,
    gap_penalty: float = -1,
    gap_extension_penalty: float = -1,
) -> List[str]:
    """Align two prediction streams and fuse them (reference policy).

    ref = image prediction, query = audio prediction in the reference driver
    (smith_waterman/test.py:143-157). Probabilities are per-token scores
    (the reference uses raw top-1 logits). Ties go to the query.
    """
    r = [_SENT_L] + list(ref_tokens) + [_SENT_R]
    q = [_SENT_L] + list(query_tokens) + [_SENT_R]
    rp = [1.0] + list(ref_probs) + [1.0]
    qp = [1.0] + list(query_probs) + [1.0]
    cigar, ri, qi = align_tokens(r, q, match, mismatch, gap_penalty, gap_extension_penalty)

    fused: List[str] = []
    for op, count in cigar:
        for _ in range(count):
            if op == OP_MATCH:
                tok_r, tok_q = r[ri], q[qi]
                if tok_r == tok_q:
                    fused.append(tok_q)
                else:  # mismatch: higher prob wins, query wins ties
                    fused.append(tok_q if qp[qi] >= rp[ri] else tok_r)
                ri += 1
                qi += 1
            elif op == OP_DEL:  # token only in ref
                fused.append(r[ri])
                ri += 1
            else:  # OP_INS: token only in query
                fused.append(q[qi])
                qi += 1
    return [t for t in fused if t not in (_SENT_L, _SENT_R)]
