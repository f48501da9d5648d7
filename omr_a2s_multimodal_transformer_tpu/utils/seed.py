"""Determinism helpers (reference src/utils/seed.py).

JAX is deterministic given PRNG keys; this seeds the host-side RNGs
(python/numpy, used for shuffling and modality draws) and sets
PYTHONHASHSEED for reproducible dict ordering in subprocesses.
"""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int = 42) -> None:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
