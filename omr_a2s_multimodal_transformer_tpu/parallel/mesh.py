"""Device mesh construction and sharding rules (dp + tp).

The reference is single-device (no parallelism anywhere; SURVEY.md §2.5).
Here scaling is first-class and idiomatic: a ``jax.sharding.Mesh`` with
``('data', 'model')`` axes; batches shard over 'data', the decoder's
matmuls (qkv/ff/vocab projections + embedding) shard over 'model', and
GSPMD inserts the ICI collectives. The conv stem (<=256 channels) is
replicated — its FLOPs parallelize over 'data' and channel sharding would
only add all-to-alls.

Works identically on real TPU slices and on the CPU simulation mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N) used in tests.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh over available devices: data axis = n_devices // model by default."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


# Param-path regex -> PartitionSpec. First match wins; default replicated.
# Paths look like "decoder/layer3/self_attn/q_proj/kernel".
TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r"decoder/.*(q_proj|k_proj|v_proj)/kernel$", P(None, "model")),  # shard heads
    (r"decoder/.*(q_proj|k_proj|v_proj)/bias$", P("model")),
    (r"decoder/.*out_proj/kernel$", P("model", None)),
    (r"decoder/.*linear1/kernel$", P(None, "model")),
    (r"decoder/.*linear1/bias$", P("model")),
    (r"decoder/.*linear2/kernel$", P("model", None)),
    (r"decoder/embedding$", P(None, None)),  # small table row-gather; replicate
    (r"decoder/out_layer/kernel$", P(None, "model")),  # vocab-sharded logits
    (r"decoder/out_layer/bias$", P("model")),
    (r"cross_attn/.*(q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    (r"cross_attn/.*(q_proj|k_proj|v_proj)/bias$", P("model")),
    (r"cross_attn/.*out_proj/kernel$", P("model", None)),
)


def spec_for_path(path: str, rules: Sequence[Tuple[str, P]] = TP_RULES) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path):
            return spec
    return P()  # replicated


def param_shardings(params, mesh: Mesh, rules: Sequence[Tuple[str, P]] = TP_RULES):
    """Pytree of NamedShardings matching `params` (tensor-parallel rules)."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp) -> str:
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    specs = {path_str(kp): spec_for_path(path_str(kp), rules) for kp, _ in flat}

    def to_sharding(kp, leaf):
        spec = specs[path_str(kp)]
        # Drop axes that don't fit the leaf's rank or size.
        ndim = getattr(leaf, "ndim", 0)
        entries = list(spec) + [None] * (ndim - len(spec))
        entries = entries[:ndim]
        fixed = []
        for dim, ax in enumerate(entries):
            if ax is not None and leaf.shape[dim] % mesh.shape[ax] != 0:
                ax = None  # indivisible -> replicate this dim
            fixed.append(ax)
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch dict with batch-dim sharding over 'data'.

    Remainder batches (leading dim not divisible by the data axis) are
    PADDED to divisibility — replicating them instead would run the full
    batch redundantly on every device, exactly where eval is most
    expensive. Inputs (x/hw keys) pad by repeating the last sample so
    padded rows stay numerically benign (an all-invalid memory mask would
    softmax over -inf); targets (y* keys) pad with zeros so the pad-masked
    loss ignores them. Consumers drop the extra rows (the eval loop zips
    decode output against the UNpadded host targets)."""
    import jax.numpy as jnp

    data = mesh.shape["data"]
    sharded = batch_sharding(mesh)
    repl = replicated(mesh)

    def put(key_is_target, x):
        if getattr(x, "ndim", 0) < 1:
            return jax.device_put(x, repl)
        pad = (-x.shape[0]) % data
        if pad:
            filler = (
                jnp.zeros((pad,) + x.shape[1:], x.dtype)
                if key_is_target
                else jnp.repeat(x[-1:], pad, axis=0)
            )
            x = jnp.concatenate([jnp.asarray(x), filler], axis=0)
        return jax.device_put(x, sharded)

    if isinstance(batch, dict):
        return {k: jax.tree.map(lambda x, k=k: put(str(k).startswith("y"), x), v)
                for k, v in batch.items()}
    return jax.tree.map(lambda x: put(False, x), batch)
