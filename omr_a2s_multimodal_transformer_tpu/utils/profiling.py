"""Profiling / tracing hooks (SURVEY.md §5: the reference has none).

- ``trace(dir)``: context manager around jax.profiler (Perfetto/TensorBoard
  trace of device execution) — wrap any train/eval region.
- ``StepTimer``: lightweight wall-clock accounting per named phase with an
  EMA, logged through the MetricsLogger.
- ``annotate(name)``: TraceAnnotation for host-side spans inside a trace.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Per-phase wall-clock EMA (e.g. data / step / eval)."""

    def __init__(self, decay: float = 0.9):
        self.decay = decay
        self.ema: Dict[str, float] = {}
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            prev = self.ema.get(name)
            self.ema[name] = dt if prev is None else self.decay * prev + (1 - self.decay) * dt

    def summary(self) -> Dict[str, float]:
        out = {}
        for name, total in self.totals.items():
            out[f"time_{name}_total_s"] = round(total, 4)
            out[f"time_{name}_ema_s"] = round(self.ema[name], 5)
        return out
