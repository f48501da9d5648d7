"""grain-based input pipeline (multiprocess ingest for TPU).

The reference feeds the GPU with a 20-worker torch DataLoader
(ar_dataset.py:115-122). The TPU-native equivalent is a ``grain.DataLoader``:
deterministic index sampling, multiprocess workers running the host
frontends (tokenizer + PIL + log-STFT), per-host sharding for multi-host
meshes (``ShardByJaxProcess``), and our static-shape bucketed collate as the
final batch transform. Falls back to the thread-pool ``Loader`` when grain
is unavailable.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from omr_a2s_multimodal_transformer_tpu.data import collate as C
from omr_a2s_multimodal_transformer_tpu.data.dataset import ARDataset


class _Source:
    """grain RandomAccessDataSource view of an ARDataset."""

    def __init__(self, ds: ARDataset):
        self._ds = ds

    def __len__(self) -> int:
        return len(self._ds)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        return self._ds[int(idx)]


class GrainLoader:
    """Iterable of static-shape numpy batch dicts, backed by grain."""

    def __init__(
        self,
        dataset: ARDataset,
        batch_size: int,
        shuffle: bool,
        seed: int = 0,
        num_workers: int = 4,
        num_epochs: Optional[int] = None,
        drop_remainder: bool = False,
        shard_by_process: bool = True,
        image_bucket: Optional[C.BucketSpec] = None,
        audio_bucket: Optional[C.BucketSpec] = None,
    ):
        import grain.python as pg

        self.ds = dataset
        self.batch_size = batch_size
        m = dataset.input_modality
        self.image_bucket = image_bucket or C.BucketSpec.single(
            dataset.max_image_height, dataset.max_image_width, dataset.max_seq_len + 1
        )
        self.audio_bucket = audio_bucket or C.BucketSpec.single(
            dataset.max_audio_height, dataset.max_audio_width, dataset.max_seq_len + 1
        )
        self.bucket = self.image_bucket if m == "image" else self.audio_bucket

        shard_options = (
            pg.ShardByJaxProcess(drop_remainder=True) if shard_by_process else pg.NoSharding()
        )
        self._pg = pg
        self._sampler_kwargs = dict(
            num_records=len(dataset),
            shard_options=shard_options,
            shuffle=shuffle,
            num_epochs=num_epochs or 1,
            seed=seed,
        )
        # No grain Batch op: samples are ragged (variable H/W/len); batching
        # to static bucketed shapes happens in _collate on the main process.
        self._loader = pg.DataLoader(
            data_source=_Source(dataset),
            sampler=pg.IndexSampler(**self._sampler_kwargs),
            operations=[],
            worker_count=num_workers,
        )
        self.drop_remainder = drop_remainder

    def __len__(self) -> int:
        import math

        return math.ceil(len(self.ds) / self.batch_size)

    def _collate(self, samples) -> Dict[str, np.ndarray]:
        m = self.ds.input_modality
        if m == "both":
            hi = max(s["xi"].shape[1] for s in samples)
            wi = max(s["xi"].shape[2] for s in samples)
            ha = max(s["xa"].shape[1] for s in samples)
            wa = max(s["xa"].shape[2] for s in samples)
            ly = max(len(s["y"]) for s in samples)
            ti = self.image_bucket.pick(hi, wi, ly)
            ta = self.audio_bucket.pick(ha, wa, ly)
            return C.collate_multimodal(samples, (ti[0], ti[1]), (ta[0], ta[1]), ti[2])
        pad = C.IMAGE_PAD_VALUE if m == "image" else C.AUDIO_PAD_VALUE
        h = max(s["x"].shape[1] for s in samples)
        w = max(s["x"].shape[2] for s in samples)
        ly = max(len(s["y"]) for s in samples)
        th, tw, tl = self.bucket.pick(h, w, ly)
        return C.collate_unimodal(samples, pad, th, tw, tl)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        buf = []
        for sample in self._loader:
            buf.append(sample)
            if len(buf) == self.batch_size:
                yield self._collate(buf)
                buf = []
        if buf and not self.drop_remainder:
            yield self._collate(buf)
