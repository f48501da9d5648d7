"""Multi-host (DCN) initialization helpers.

Single-host meshes need nothing; on a multi-host TPU slice call
``initialize()`` once per process before touching devices — JAX then exposes
the global device set and GSPMD routes the 'data'/'model' collectives over
ICI within a slice and DCN across slices. Pair with
``grain.ShardByJaxProcess`` (data/grain_pipeline.py) so each host reads its
own shard of the input.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID; TPU pods usually
    auto-detect and need no arguments)."""
    import jax

    kwargs = {}
    addr = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if addr:
        kwargs["coordinator_address"] = addr
    n = num_processes or os.environ.get("NUM_PROCESSES")
    if n:
        kwargs["num_processes"] = int(n)
    pid = process_id if process_id is not None else os.environ.get("PROCESS_ID")
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0
