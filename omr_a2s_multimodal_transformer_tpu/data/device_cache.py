"""Device-resident dataset cache: pin a small corpus in HBM once, assemble
batches with on-device gathers.

The reference re-collates and re-ships every batch every epoch
(``/root/reference/src/data/ar_dataset.py`` + torch DataLoader). For the
corpora this model trains on (GRANDSTAFF-scale: a few thousand samples;
synthetic convergence corpora: a few hundred), the whole preprocessed
dataset fits in a fraction of one chip's HBM — e.g. 256 bf16 images at
361x4416 are ~0.8 GB. Host->device transfer is the training bottleneck
behind any staging link (measured here: ~97% of epoch wall time behind the
remote-TPU tunnel; on pods it is real PCIe pressure), so the TPU-first
layout is: preprocess + collate each sample ONCE, stack per-key tensors on
the device, and build each step's batch as an on-device ``jnp.take`` over a
host-chosen index permutation (a few hundred bytes per step on the wire).

Exactness: with a single-bucket ``BucketSpec`` every sample pads to the
same static target, so per-sample collation rows equal the rows of any
batch collation — cached batches are bit-identical to the streaming
loader's (same shuffle stream: ``Loader._order`` is reused). Multi-bucket
loaders are rejected (batch padding would depend on batch composition);
the streaming loader remains the path for large/bucketed corpora.
"""

from __future__ import annotations

import logging
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

# float input keys shipped/stored as bf16 when the train step computes in
# bf16 (it downcasts on-device anyway; see Trainer._BF16_SHIP_KEYS)
_CAST_KEYS = ("x", "xi", "xa")

# image keys per input modality: eligible for uint8 residency (pixel values
# are k/255 for u8-origin images with no resize, so u8 round-trips EXACTLY;
# spectrograms are arbitrary floats and stay in the cast path)
_IMAGE_KEYS = {"image": ("x",), "both": ("xi",), "audio": ()}

# samples per preprocessing/transfer chunk while building the cache
_CHUNK = 16

# Per-buffer residency ceiling. The TPU compile path rejects gathers over
# stacked buffers well above 2^32 bytes (measured on v5e: a 4.49 GB u8
# stack compiles, a 6.53 GB one fails in the AOT compile helper), so keys
# whose corpus stack exceeds this are split into row-contiguous SHARDS and
# batch gathers select across them (bit-identical; see _take_sharded).
_MAX_STACK_BYTES = int(os.environ.get("OMR_A2S_CACHE_MAX_STACK_BYTES", 4 << 30))


def _single_bucket(spec) -> bool:
    return len(spec.heights) == 1 and len(spec.widths) == 1 and len(spec.lengths) == 1


class DeviceCacheLoader:
    """Wrap a ``dataset.Loader``; same iteration protocol, same batches
    (bit-identical under a single-bucket spec), near-zero per-step wire cost.

    Builds lazily on first iteration: preprocess+collate sample chunks on
    host threads, cast float inputs to ``cast_dtype`` (the wire/store dtype),
    transfer once, concatenate into per-key device stacks.
    """

    def __init__(self, loader, cast_bf16: bool = False, store_u8: bool = False):
        m = loader.ds.input_modality
        buckets: Tuple = (
            (loader.image_bucket, loader.audio_bucket) if m == "both" else (loader.bucket,)
        )
        if not all(_single_bucket(b) for b in buckets):
            raise ValueError(
                "DeviceCacheLoader requires single-bucket specs (batch padding must "
                "not depend on batch composition); use the streaming Loader for "
                "width-bucketed corpora"
            )
        self.loader = loader
        self.batch_size = loader.batch_size
        self.cast_dtype = jnp.bfloat16 if cast_bf16 else None
        # u8 image residency: 2x (vs bf16) / 4x (vs f32) more corpus per GB of
        # HBM — what makes a 4k-sample full-res GRANDSTAFF-shape corpus fit on
        # one 16 GB chip. Verified EXACT during the build (see _build); the
        # dequantized batch equals the streaming loader's bit-for-bit.
        self.u8_keys = _IMAGE_KEYS.get(loader.ds.input_modality, ()) if store_u8 else ()
        self.max_stack_bytes = _MAX_STACK_BYTES
        # per key: list of (row_offset, device array) shards; one shard for
        # keys under max_stack_bytes (the common case — single jnp.take)
        self._stacks: Dict[str, List[Tuple[int, jax.Array]]] = {}

    def __len__(self) -> int:
        return len(self.loader)

    @property
    def ds(self):
        return self.loader.ds

    def nbytes(self) -> int:
        return sum(
            int(np.prod(v.shape)) * v.dtype.itemsize
            for shards in self._stacks.values()
            for _, v in shards
        )

    def _build(self) -> None:
        ds = self.loader.ds
        n = len(ds)
        host_chunks = []  # list of {key: HOST array [chunk, ...]}
        with ThreadPoolExecutor(max_workers=max(1, self.loader.num_threads)) as ex:
            for lo in range(0, n, _CHUNK):
                idx = list(range(lo, min(lo + _CHUNK, n)))
                samples = list(ex.map(ds.__getitem__, idx))
                batch = self.loader._collate(samples)
                for k in self.u8_keys:
                    if k in batch and batch[k].dtype == np.float32:
                        q = np.round(batch[k] * 255.0).astype(np.uint8)
                        if not np.array_equal(q.astype(np.float32) / np.float32(255.0), batch[k]):
                            raise ValueError(
                                f"device cache store_u8: key '{k}' is not exactly "
                                "k/255-valued (resized or non-u8-origin images?); "
                                "disable u8 residency for this corpus"
                            )
                        batch[k] = q
                if self.cast_dtype is not None:
                    for k in _CAST_KEYS:
                        if k in batch and k not in self.u8_keys and batch[k].dtype == np.float32:
                            batch[k] = batch[k].astype(self.cast_dtype)
                host_chunks.append(batch)
        # Concatenate on the HOST and ship each key once: device-side chunk
        # copies + a device concatenate would hold ~2x the corpus in HBM at
        # the concatenate, OOMing builds that fit at steady state. Host RAM
        # is the cheap side of this trade. Keys whose stack exceeds
        # max_stack_bytes ship as several row-contiguous shards instead —
        # one giant buffer fails TPU gather compilation (module docstring).
        self._stacks = {}
        for k in list(host_chunks[0]):
            host = np.concatenate([c.pop(k) for c in host_chunks], axis=0)
            row_bytes = max(1, int(np.prod(host.shape[1:])) * host.dtype.itemsize)
            rows_per_shard = max(1, min(n, self.max_stack_bytes // row_bytes))
            self._stacks[k] = [
                (lo, jnp.asarray(host[lo : lo + rows_per_shard]))
                for lo in range(0, n, rows_per_shard)
            ]
        logger.info(
            "device cache: %d samples, %.1f MB resident (%s)",
            n, self.nbytes() / 2**20,
            ", ".join(
                f"{k}:{shards[0][1].dtype}[{n},{list(shards[0][1].shape[1:])}]"
                + (f" x{len(shards)} shards" if len(shards) > 1 else "")
                for k, shards in self._stacks.items()
            ),
        )

    @staticmethod
    def _take_sharded(shards: List[Tuple[int, jax.Array]], idx: jax.Array) -> jax.Array:
        """Batch gather across row-contiguous shards; bit-identical to a
        jnp.take over the virtual concatenation. Out-of-shard rows are
        clip-gathered then replaced via where, so every lane stays in
        bounds and the select is exact for any dtype."""
        if len(shards) == 1:
            return jnp.take(shards[0][1], idx, axis=0)
        out = None
        for off, arr in shards:
            local = jnp.clip(idx - off, 0, arr.shape[0] - 1)
            cand = jnp.take(arr, local, axis=0)
            if out is None:
                out = cand
                continue
            mask = (idx >= off) & (idx < off + arr.shape[0])
            out = jnp.where(mask.reshape(mask.shape + (1,) * (cand.ndim - 1)), cand, out)
        return out

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        if not self._stacks:
            self._build()
        # identical shuffle stream + batch split to the streaming Loader
        order = self.loader._order()
        self.loader.epoch += 1
        bs = self.batch_size
        batches = [order[i : i + bs] for i in range(0, len(order), bs)]
        if self.loader.drop_remainder and batches and len(batches[-1]) < bs:
            batches.pop()
        for b in batches:
            idx = jnp.asarray(b, dtype=jnp.int32)
            out = {k: self._take_sharded(shards, idx) for k, shards in self._stacks.items()}
            for k in self.u8_keys:
                if k in out:
                    # u8 -> float batch. In the bf16 compute path this is
                    # EXACT vs the streaming loader's host-side bf16(k/255):
                    # bf16 rounding of k/255 and k*(1/255) agree for all 256
                    # values (verified), so XLA strength-reduction can't
                    # change the result.
                    dt = self.cast_dtype or jnp.float32
                    out[k] = (out[k].astype(jnp.float32) / jnp.float32(255.0)).astype(dt)
            yield out
