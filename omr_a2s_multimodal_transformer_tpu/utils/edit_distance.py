"""Levenshtein distance: native C++ kernel with numpy fallback.

The reference computes edit distance with a pure-Python DP
(metrics.py:56-73) — the host-side bottleneck of large eval sweeps. Here
tokens are interned to int32 and the DP runs either in the C++ extension
(``native/libeditdist.so``, built by ``native/build.sh``) or in a
numpy-vectorized fallback (row loop in C via numpy ufuncs).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _load_native() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (
        os.path.join(here, "native", "libeditdist.so"),
        os.path.join(os.path.dirname(__file__), "libeditdist.so"),
    ):
        if os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                lib.levenshtein_i32.restype = ctypes.c_int64
                lib.levenshtein_i32.argtypes = [
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int64,
                ]
                _LIB = lib
                return lib
            except OSError:
                continue
    return None


def _intern(a: Sequence, b: Sequence):
    table = {}
    def ids(seq):
        out = np.empty(len(seq), np.int32)
        for i, t in enumerate(seq):
            out[i] = table.setdefault(t, len(table))
        return out
    return ids(a), ids(b)


def _lev_numpy(a: np.ndarray, b: np.ndarray) -> int:
    n, m = len(a), len(b)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = np.arange(n + 1, dtype=np.int32)
    cur = np.empty(n + 1, dtype=np.int32)
    for i in range(1, m + 1):
        cur[0] = i
        sub = prev[:-1] + (a != b[i - 1])
        dele = prev[1:] + 1
        np.minimum(sub, dele, out=sub)
        # insertion has a sequential dependency -> running scan
        run = cur[0]
        for j in range(1, n + 1):
            run = min(run + 1, sub[j - 1])
            cur[j] = run
        prev, cur = cur, prev
    return int(prev[n])


def levenshtein(a: Sequence, b: Sequence) -> int:
    """Edit distance between two token sequences (any hashable tokens)."""
    ia, ib = _intern(a, b)
    lib = _load_native()
    if lib is not None:
        return int(
            lib.levenshtein_i32(
                ia.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ia),
                ib.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ib),
            )
        )
    return _lev_numpy(ia, ib)


def levenshtein_python(a: Sequence, b: Sequence) -> int:
    """Reference-identical pure-Python DP (for differential testing)."""
    n, m = len(a), len(b)
    if n > m:
        a, b, n, m = b, a, m, n
    current = list(range(n + 1))
    for i in range(1, m + 1):
        previous, current = current, [i] + [0] * n
        for j in range(1, n + 1):
            add, delete = previous[j] + 1, current[j - 1] + 1
            change = previous[j - 1] + (a[j - 1] != b[i - 1])
            current[j] = min(add, delete, change)
    return current[n]
