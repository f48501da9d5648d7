"""Sample sources: HF Hub, local directory tree, and synthetic corpus.

A source yields dict samples with keys:
  - 'transcript': raw kern/bekern text (str)
  - 'image':      PIL.Image (when the modality is available)
  - 'audio':      {'array': np.ndarray float32, 'sampling_rate': int}

``HFSource`` mirrors the reference's ingest
(``/root/reference/src/data/ar_dataset.py:233``, datasets
``PRAIG/{ds}-grandstaff-multimodal``). ``DirectorySource`` reads the
on-disk layout produced by dataset preparation
(``composer/{img,img_distorted,krn,bekrn,wav}``). ``SyntheticSource``
generates a deterministic miniature corpus for tests and benchmarks —
the 'fake backend' the reference lacks.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

DATASETS = ["grandstaff", "beethoven", "chopin", "hummel", "joplin", "mozart", "scarlatti-d"]
SPLITS = ["train", "val", "test"]
MODALITIES = ["audio", "image", "both"]


class HFSource:
    """HuggingFace-datasets-backed source (needs network or a local HF cache)."""

    def __init__(self, ds_name: str, split: str, encoding: str = "bekern", use_distorted_images: bool = False):
        from datasets import load_dataset

        assert ds_name in DATASETS, f"Invalid dataset name: {ds_name}"
        assert split in SPLITS, f"Invalid split: {split}"
        self.ds = load_dataset(f"PRAIG/{ds_name}-grandstaff-multimodal", split=split)
        self.encoding = encoding
        self.image_key = "image_distorted" if use_distorted_images else "image"

    def __len__(self) -> int:
        return len(self.ds)

    def __getitem__(self, idx: int) -> Dict:
        s = self.ds[idx]
        return {"transcript": s[self.encoding], "image": s[self.image_key], "audio": s["audio"]}

    def transcripts(self) -> List[str]:
        return list(self.ds[self.encoding])


class DirectorySource:
    """Local grandstaff tree + partition files (one `composer\\tpiece` or
    `piece` line per sample, reference prepare_dataset.py:241-259)."""

    def __init__(
        self,
        root: str,
        ds_name: str,
        split: str,
        encoding: str = "bekern",
        use_distorted_images: bool = False,
    ):
        self.root = root
        self.encoding = encoding
        self.img_dir = "img_distorted" if use_distorted_images else "img"
        self.img_suffix = "_distorted.jpg" if use_distorted_images else ".jpg"
        part = os.path.join(root, "partitions", ds_name, f"{split}.txt")
        with open(part) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        self.items = []
        for ln in lines:
            composer, piece = ln.split("\t") if "\t" in ln else (ds_name, ln)
            self.items.append((composer, piece))

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int) -> Dict:
        from PIL import Image
        from scipy.io import wavfile

        composer, piece = self.items[idx]
        base = os.path.join(self.root, composer)
        krn_dir = "bekrn" if self.encoding == "bekern" else "krn"
        with open(os.path.join(base, krn_dir, piece + ("." + krn_dir))) as f:
            transcript = f.read()
        image = Image.open(os.path.join(base, self.img_dir, piece + self.img_suffix))
        sr, wave = wavfile.read(os.path.join(base, "wav", piece + ".wav"))
        if wave.dtype.kind == "i":
            wave = wave.astype(np.float32) / np.iinfo(wave.dtype).max
        if wave.ndim == 2:
            wave = wave.mean(axis=1)
        return {"transcript": transcript, "image": image, "audio": {"array": wave.astype(np.float32), "sampling_rate": int(sr)}}

    def transcripts(self) -> List[str]:
        out = []
        krn_dir = "bekrn" if self.encoding == "bekern" else "krn"
        for composer, piece in self.items:
            with open(os.path.join(self.root, composer, krn_dir, piece + "." + krn_dir)) as f:
                out.append(f.read())
        return out


_PITCHES = ["c", "d", "e", "f", "g", "a", "b", "cc", "dd", "ee", "C", "D", "E", "F", "G", "A", "B"]
_DURS = ["2", "4", "8", "16"]


def synthetic_kern(rng: np.random.Generator, n_measures: int = 4, notes_per_measure: int = 4) -> str:
    """Deterministic pseudo-score: 2 voices, clefs, meter, barlines, chords."""
    lines = ["**kern\t**kern", "*clefF4\t*clefG2", "*M4/4\t*M4/4"]
    for m in range(n_measures):
        lines.append(f"={m + 1}\t={m + 1}")
        for _ in range(notes_per_measure):
            def note():
                d = _DURS[rng.integers(len(_DURS))]
                p = _PITCHES[rng.integers(len(_PITCHES))]
                acc = ["", "#", "-"][rng.integers(3)]
                return f"{d}{p}{acc}"

            left = note() if rng.random() > 0.2 else "."
            right = note() + (" " + note() if rng.random() > 0.7 else "")
            lines.append(f"{left}\t{right}")
    lines.append("*-\t*-")
    return "\n".join(lines) + "\n"


class SyntheticSource:
    """Deterministic miniature multimodal corpus (images + audio + kern)."""

    def __init__(
        self,
        n: int = 16,
        seed: int = 0,
        img_height_range=(48, 64),
        img_width_range=(96, 160),
        audio_seconds_range=(0.5, 1.5),
        n_measures: int = 2,
        encoding: str = "kern",
    ):
        self.n = n
        self.seed = seed
        self.img_height_range = img_height_range
        self.img_width_range = img_width_range
        self.audio_seconds_range = audio_seconds_range
        self.n_measures = n_measures
        self.encoding = encoding

    def __len__(self) -> int:
        return self.n

    def _rng(self, idx: int) -> np.random.Generator:
        return np.random.default_rng(self.seed * 100003 + idx)

    def __getitem__(self, idx: int) -> Dict:
        from PIL import Image

        # Transcript uses a FRESH generator so it matches transcripts()
        # regardless of how many draws the image/audio below consume.
        transcript = synthetic_kern(self._rng(idx), n_measures=self.n_measures)
        rng = np.random.default_rng(self.seed * 100003 + idx + 7919)
        h = int(rng.integers(*self.img_height_range))
        w = int(rng.integers(*self.img_width_range))
        # White page with staff lines and note blobs.
        img = np.full((h, w), 255, dtype=np.uint8)
        for line in range(5):
            y = int(h * (0.3 + 0.08 * line))
            img[y : y + 1, :] = 0
        for _ in range(10):
            cy, cx = int(rng.integers(4, h - 4)), int(rng.integers(4, w - 4))
            img[cy - 2 : cy + 2, cx - 2 : cx + 2] = 0
        # Sine-mixture audio at 22.05 kHz.
        secs = float(rng.uniform(*self.audio_seconds_range))
        t = np.arange(int(22050 * secs)) / 22050.0
        wave = np.zeros_like(t, dtype=np.float32)
        for _ in range(4):
            f0 = float(rng.uniform(110, 880))
            on = float(rng.uniform(0, secs * 0.5))
            wave += (0.2 * np.sin(2 * np.pi * f0 * t) * (t >= on)).astype(np.float32)
        return {
            "transcript": transcript,
            "image": Image.fromarray(img),
            "audio": {"array": wave, "sampling_rate": 22050},
        }

    def transcripts(self) -> List[str]:
        return [synthetic_kern(self._rng(i), n_measures=self.n_measures) for i in range(self.n)]


def make_source(
    ds_name: str,
    split: str,
    encoding: str = "bekern",
    use_distorted_images: bool = False,
    data_root: Optional[str] = None,
    synthetic: bool = False,
    synthetic_kwargs: Optional[Dict] = None,
):
    """Source factory: synthetic -> local directory -> HF Hub."""
    if synthetic or ds_name == "synthetic":
        kw = dict(synthetic_kwargs or {})
        kw.setdefault("encoding", encoding)
        kw.setdefault("seed", {"train": 1, "val": 2, "test": 3}[split])
        return SyntheticSource(**kw)
    if data_root is not None and os.path.isdir(os.path.join(data_root, "partitions")):
        return DirectorySource(data_root, ds_name, split, encoding, use_distorted_images)
    return HFSource(ds_name, split, encoding, use_distorted_images)
