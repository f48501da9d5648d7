"""Debug-mode numerical checking (SURVEY.md §5: sanitizer equivalent).

``checked(fn)`` wraps a jittable function with ``jax.experimental.checkify``
so NaN/Inf and out-of-bounds indexing raise with a location instead of
silently corrupting training. Costs throughput — enable only while
debugging (``OMR_A2S_DEBUG_CHECKS=1`` or the explicit wrapper).
"""

from __future__ import annotations

import functools
import os
from typing import Callable

from jax.experimental import checkify


def debug_checks_enabled() -> bool:
    return os.environ.get("OMR_A2S_DEBUG_CHECKS", "0") not in ("0", "", "false")


def checked(fn: Callable, errors=None) -> Callable:
    """Wrap fn with float (NaN/Inf) + index checks; raises on error."""
    errors = errors or (checkify.float_checks | checkify.index_checks)
    cfn = checkify.checkify(fn, errors=errors)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def maybe_checked(fn: Callable) -> Callable:
    return checked(fn) if debug_checks_enabled() else fn
