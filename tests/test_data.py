"""Unit tests: collate/padding semantics, vocab construction + caches,
loader bucketing, synthetic source determinism."""

import numpy as np
import pytest

from omr_a2s_multimodal_transformer_tpu.data import collate as C
from omr_a2s_multimodal_transformer_tpu.data.sources import SyntheticSource
from omr_a2s_multimodal_transformer_tpu.data.vocab import PAD_TOKEN, Vocabulary, build_vocabulary


def test_pad_values_and_shapes():
    xs = [np.zeros((1, 4, 6)), np.zeros((1, 3, 5))]
    ys = [np.array([1, 5, 2]), np.array([1, 2])]
    samples = [{"x": x, "y": y} for x, y in zip(xs, ys)]
    b = C.collate_unimodal(samples, pad_value=1.0)
    assert b["x"].shape == (2, 4, 6, 1)
    assert b["x"][1, 3, 0, 0] == 1.0 and b["x"][1, 0, 5, 0] == 1.0  # white pad
    assert b["y_in"].tolist() == [[1, 5], [1, 0]]
    assert b["y_out"].tolist() == [[5, 2], [2, 0]]
    np.testing.assert_array_equal(b["x_hw"], [[4, 6], [3, 5]])


def test_frames_formula():
    # reference ar_dataset.py:439-442: ceil(h/16)*ceil(w/8)
    assert C.num_frames(32, 64) == 2 * 8
    assert C.num_frames(33, 65) == 3 * 9
    assert C.num_frames(1, 1) == 1


def test_bucket_spec():
    spec = C.BucketSpec(heights=(32,), widths=(64, 128, 256), lengths=(16, 64))
    assert spec.pick(30, 100, 10) == (32, 128, 16)
    assert spec.pick(30, 300, 100) == (32, 256, 64)  # overflow -> max bucket


def test_vocabulary_reference_layout():
    v = build_vocabulary(["**kern\n*clefG2\n4c\n=1\n"], encoding="kern")
    assert v.w2i[PAD_TOKEN] == 0
    ids = sorted(v.w2i.values())
    assert ids == list(range(len(ids)))  # dense ids from 0
    # sorted token order with ids from 1
    non_pad = {k: i for k, i in v.w2i.items() if k != PAD_TOKEN}
    toks = sorted(non_pad.keys())
    assert [non_pad[t] for t in toks] == list(range(1, len(toks) + 1))
    # round-trip
    seq = ["*clefG2", "4c", "="]
    assert v.tokens(v.ids(seq))[1:-1] == seq


def test_vocab_save_load(tmp_path):
    v = build_vocabulary(["**kern\n*clefG2\n4c\n"], encoding="kern")
    p = str(tmp_path / "vocabs" / "v.json")
    v.save(p)
    v2 = Vocabulary.load(p)
    assert v2.w2i == v.w2i and v2.i2w == v.i2w


def test_synthetic_source_deterministic():
    s1, s2 = SyntheticSource(n=3, seed=5), SyntheticSource(n=3, seed=5)
    a, b = s1[1], s2[1]
    assert a["transcript"] == b["transcript"]
    np.testing.assert_array_equal(np.asarray(a["image"]), np.asarray(b["image"]))
    np.testing.assert_array_equal(a["audio"]["array"], b["audio"]["array"])
    # transcripts() agrees with __getitem__
    assert s1.transcripts()[1] == a["transcript"]


def test_loader_shapes_static(tmp_path):
    from omr_a2s_multimodal_transformer_tpu.data.dataset import ARDataset, Loader

    ds = ARDataset(
        "synthetic", "train", "kern", "image", synthetic=True,
        synthetic_kwargs=dict(n=5, img_height_range=(32, 33), img_width_range=(50, 90),
                              audio_seconds_range=(0.2, 0.3), n_measures=1),
        cache_root=str(tmp_path),
    )
    loader = Loader(ds, batch_size=2, shuffle=False, num_threads=1)
    shapes = {b["x"].shape[1:] for b in loader}
    assert len(shapes) == 1  # single bucket -> one static shape


def test_grain_loader(tmp_path):
    pytest.importorskip("grain")
    from omr_a2s_multimodal_transformer_tpu.data.dataset import ARDataset
    from omr_a2s_multimodal_transformer_tpu.data.grain_pipeline import GrainLoader

    ds = ARDataset(
        "synthetic", "train", "kern", "image", synthetic=True,
        synthetic_kwargs=dict(n=5, img_height_range=(32, 33), img_width_range=(50, 90),
                              audio_seconds_range=(0.2, 0.3), n_measures=1),
        cache_root=str(tmp_path),
    )
    gl = GrainLoader(ds, batch_size=2, shuffle=True, seed=0, num_workers=0, shard_by_process=False)
    batches = list(gl)
    assert sum(b["x"].shape[0] for b in batches) == 5
    shapes = {b["x"].shape[1:] for b in batches}
    assert len(shapes) == 1  # static bucket


def test_geometric_bucket_ladder(tmp_path):
    from omr_a2s_multimodal_transformer_tpu.data.dataset import ARDataset, Loader

    ds = ARDataset(
        "synthetic", "train", "kern", "image", synthetic=True,
        synthetic_kwargs=dict(n=6, img_height_range=(32, 33), img_width_range=(40, 160),
                              audio_seconds_range=(0.2, 0.3), n_measures=1),
        cache_root=str(tmp_path),
    )
    spec = C.BucketSpec.geometric(ds.max_image_height, ds.max_image_width, ds.max_seq_len + 1, 3)
    loader = Loader(ds, batch_size=2, shuffle=False, num_threads=1, image_bucket=spec)
    widths = sorted({b["x"].shape[2] for b in loader})
    assert all(w in spec.widths for w in widths)
    assert len(spec.widths) >= 2  # a real ladder, not a single bucket
