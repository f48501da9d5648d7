"""Device-resident dataset cache (data/device_cache.py): cached batches must
be bit-identical to the streaming Loader's (same shuffle stream, same
single-bucket padding), including through a full Trainer fit."""

import numpy as np
import pytest

from omr_a2s_multimodal_transformer_tpu.data import collate as C
from omr_a2s_multimodal_transformer_tpu.data.dataset import ARDataModule, Loader
from omr_a2s_multimodal_transformer_tpu.data.device_cache import DeviceCacheLoader

SYN = dict(n=7, img_height_range=(32, 33), img_width_range=(64, 96),
           audio_seconds_range=(0.3, 0.5), n_measures=1)


@pytest.fixture(scope="module", params=["image", "both"])
def dm(request, tmp_path_factory):
    cache = str(tmp_path_factory.mktemp("cache"))
    dm = ARDataModule(
        ds_name="synthetic", krn_encoding="kern", input_modality=request.param,
        batch_size=3, num_workers=2, synthetic=True, synthetic_kwargs=SYN,
        cache_root=cache,
    )
    dm.setup("fit")
    return dm


def test_cached_batches_bit_identical_across_epochs(dm):
    stream = dm.train_dataloader()
    cached = DeviceCacheLoader(dm.train_dataloader(), cast_bf16=False)
    assert len(stream) == len(cached)
    for _epoch in range(2):  # shuffle stream advances identically
        sb = list(stream)
        cb = list(cached)
        assert len(sb) == len(cb)
        for s, c in zip(sb, cb):
            assert set(s) == set(c)
            for k in s:
                np.testing.assert_array_equal(s[k], np.asarray(c[k]), err_msg=k)


def test_cast_bf16_matches_trainer_wire_cast(dm):
    import jax.numpy as jnp

    cached = DeviceCacheLoader(dm.train_dataloader(), cast_bf16=True)
    b = next(iter(cached))
    float_keys = [k for k in ("x", "xi", "xa") if k in b]
    assert float_keys
    for k in float_keys:
        assert b[k].dtype == jnp.bfloat16
    # int sidecar arrays untouched
    for k in b:
        if k not in float_keys:
            assert b[k].dtype == jnp.int32


def test_multibucket_rejected(dm):
    ds = dm.train_ds
    spec = C.BucketSpec.geometric(ds.max_image_height, ds.max_image_width,
                                  ds.max_seq_len + 1, 3)
    loader = Loader(ds, 3, shuffle=False, image_bucket=spec, audio_bucket=spec)
    with pytest.raises(ValueError, match="single-bucket"):
        DeviceCacheLoader(loader)


def test_trainer_losses_bit_identical_with_device_cache(tmp_path):
    """Two fits from identical seeds — streaming vs device-cached — must
    produce the same per-epoch train losses (CPU: the gather path and the
    host-stacked path feed the jitted step identical bits)."""
    from omr_a2s_multimodal_transformer_tpu.models import build_model
    from omr_a2s_multimodal_transformer_tpu.training.loop import Trainer

    def fit(cache_dir, device_cache):
        dm = ARDataModule(
            ds_name="synthetic", krn_encoding="kern", input_modality="image",
            batch_size=3, num_workers=1, synthetic=True, synthetic_kwargs=SYN,
            cache_root=cache_dir,
        )
        dm.setup("fit")
        vocab = dm.get_vocab()
        hparams = {"vocab_size": len(vocab), "max_seq_len": dm.get_max_seq_len(),
                   "input_modality": "image", "attn_window": 10}
        model, mm = build_model(hparams)
        tag = "dc" if device_cache else "st"
        tr = Trainer(model, vocab, hparams,
                     weights_dir=str(tmp_path / f"w_{tag}"),
                     run_dir=str(tmp_path / f"r_{tag}"),
                     epochs=2, check_val_every_n_epoch=10,
                     bf16_compute=True, multimodal=mm, device_cache=device_cache)
        tr.fit(dm, auto_resume=False)
        import json, os
        rows = [json.loads(ln) for ln in open(os.path.join(str(tmp_path / f"r_{tag}"), "metrics.jsonl"))]
        return [r["train_loss"] for r in rows if "train_loss" in r]

    cache = str(tmp_path / "data_cache")
    a = fit(cache, device_cache=False)
    b = fit(cache, device_cache=True)
    assert len(a) == len(b) == 2
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_store_u8_bit_identical_to_bf16_wire_cast(dm):
    """u8 image residency: dequantized batches must equal the bf16 streaming
    cast bit-for-bit (what the train step consumes), for image keys; audio
    spectrograms stay in the cast path untouched."""
    import jax.numpy as jnp
    import ml_dtypes

    ref = DeviceCacheLoader(dm.train_dataloader(), cast_bf16=True)
    u8 = DeviceCacheLoader(dm.train_dataloader(), cast_bf16=True, store_u8=True)
    modality = dm.train_ds.input_modality
    img_key = {"image": "x", "both": "xi"}[modality]
    for rb, ub in zip(ref, u8):
        assert ub[img_key].dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(rb[img_key]).view(np.uint16),
            np.asarray(ub[img_key]).view(np.uint16), err_msg=img_key)
        if "xa" in rb:  # spectrogram: plain bf16 cast, never quantized
            np.testing.assert_array_equal(np.asarray(rb["xa"]).view(np.uint16),
                                          np.asarray(ub["xa"]).view(np.uint16))
    # residency really is uint8 (the point: 2x corpus per GB)
    assert all(arr.dtype == jnp.uint8 for _, arr in u8._stacks[img_key])


def test_store_u8_rejects_non_k255_pixels(dm):
    """Non-k/255 float images (e.g. img_height-resized corpora) must fail
    fast at build instead of silently quantizing."""
    import pytest as _pytest

    loader = dm.train_dataloader()
    orig = loader._collate

    def poisoned(samples):
        b = orig(samples)
        for k in ("x", "xi"):
            if k in b and b[k].dtype == np.float32:
                b[k] = b[k] * np.float32(0.7)  # arbitrary floats
        return b

    loader._collate = poisoned
    cached = DeviceCacheLoader(loader, cast_bf16=True, store_u8=True)
    with _pytest.raises(ValueError, match="store_u8"):
        next(iter(cached))


def test_sharded_stacks_bit_identical(dm):
    """Stacks above max_stack_bytes split into row-contiguous shards; the
    cross-shard gather must stay bit-identical to the single-stack cache
    (the TPU compile path rejects gathers over very large single buffers —
    measured v5e boundary between 4.49 and 6.53 GB)."""
    single = DeviceCacheLoader(dm.train_dataloader(), cast_bf16=False)
    sharded = DeviceCacheLoader(dm.train_dataloader(), cast_bf16=False)
    sharded.max_stack_bytes = 1  # force one row per shard (max sharding)
    for _epoch in range(2):
        sb = list(single)
        cb = list(sharded)
        assert len(sb) == len(cb)
        for s, c in zip(sb, cb):
            for k in s:
                np.testing.assert_array_equal(np.asarray(s[k]), np.asarray(c[k]), err_msg=k)
    assert all(len(sh) == len(sharded.ds) for sh in sharded._stacks.values())
    assert all(len(sh) == 1 for sh in single._stacks.values())
