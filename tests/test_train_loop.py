"""End-to-end integration on the synthetic corpus: train -> val -> best
checkpoint -> resume -> test, all on CPU. This is the reference's
train.py/test.py flow compressed (the reference has no such test)."""

import os

import numpy as np
import pytest

from omr_a2s_multimodal_transformer_tpu.data.dataset import ARDataModule
from omr_a2s_multimodal_transformer_tpu.models import build_model
from omr_a2s_multimodal_transformer_tpu.training.loop import Trainer

SYN = dict(n=6, img_height_range=(32, 33), img_width_range=(64, 96),
           audio_seconds_range=(0.3, 0.5), n_measures=1)


@pytest.fixture(scope="module")
def dm(tmp_path_factory):
    cache = str(tmp_path_factory.mktemp("cache"))
    dm = ARDataModule(
        ds_name="synthetic", krn_encoding="kern", input_modality="image",
        batch_size=3, num_workers=1, synthetic=True, synthetic_kwargs=SYN,
        cache_root=cache,
    )
    dm.setup("fit")
    dm.setup("test")
    return dm


def test_end_to_end_train_val_test(dm, tmp_path):
    vocab = dm.get_vocab()
    hparams = {
        "vocab_size": len(vocab),
        "max_seq_len": dm.get_max_seq_len(),
        "input_modality": "image",
        "attn_window": 10,
    }
    model, multimodal = build_model(hparams)
    trainer = Trainer(
        model, vocab, hparams,
        weights_dir=str(tmp_path / "weights"),
        run_dir=str(tmp_path / "run"),
        epochs=2, patience=3, check_val_every_n_epoch=1,
        bf16_compute=False, multimodal=multimodal,
    )
    result = trainer.fit(dm)
    assert np.isfinite(result["best_val_sym-er"])

    # best checkpoint written + loadable
    best = os.path.join(str(tmp_path / "weights"), "best")
    assert os.path.exists(best)

    metrics = trainer.test(dm)
    assert "test_sym-er" in metrics and np.isfinite(metrics["test_sym-er"])

    # resume path: fresh trainer restores weights
    model2, _ = build_model(hparams)
    t2 = Trainer(model2, vocab, hparams, weights_dir=str(tmp_path / "w2"),
                 run_dir=str(tmp_path / "r2"), bf16_compute=False)
    t2.restore(best)
    p_old = trainer.state.params["decoder"]["out_layer"]["kernel"]
    p_new = t2.state.params["decoder"]["out_layer"]["kernel"]
    np.testing.assert_array_equal(np.asarray(p_old), np.asarray(p_new))


def test_degraded_resume_is_loud(dm, tmp_path, caplog):
    """A structurally-incompatible full-state checkpoint must fall back to
    params-only restore LOUDLY (VERDICT r1: silent `except: pass` would
    reset Adam moments mid-run undetected)."""
    import logging

    import jax.numpy as jnp

    vocab = dm.get_vocab()
    hparams = {
        "vocab_size": len(vocab),
        "max_seq_len": dm.get_max_seq_len(),
        "input_modality": "image",
        "attn_window": 10,
    }
    model, _ = build_model(hparams)
    t1 = Trainer(model, vocab, hparams, weights_dir=str(tmp_path / "w"),
                 run_dir=str(tmp_path / "r"), bf16_compute=False)
    sample = next(iter(dm.train_dataloader()))
    t1.init_state(sample)
    path = t1.save("last")

    model2, _ = build_model(hparams)
    t2 = Trainer(model2, vocab, hparams, weights_dir=str(tmp_path / "w2"),
                 run_dir=str(tmp_path / "r2"), bf16_compute=False)
    t2.init_state(sample)
    # simulate an optimizer refactor: opt_state pytree structure changed
    t2.state = t2.state.replace(opt_state=(t2.state.opt_state, {"extra": jnp.zeros(())}))
    with caplog.at_level(logging.WARNING):
        t2.restore(path)
    assert any("PARAMS-ONLY" in r.message for r in caplog.records), caplog.records
    assert int(t2.state.step) == 0
    np.testing.assert_array_equal(
        np.asarray(t1.state.params["decoder"]["out_layer"]["kernel"]),
        np.asarray(t2.state.params["decoder"]["out_layer"]["kernel"]),
    )


def test_bf16_input_shipping_is_numerics_identical():
    """Trainer._put(bf16_inputs=True) ships f32 image tensors as bf16 (half
    the host->device bytes; loop.py). The jitted bf16 train step downcasts
    them on-device anyway, so the loss must be BIT-identical either way
    (f32->bf16 rounding commutes across the wire)."""
    import jax
    import jax.numpy as jnp

    from omr_a2s_multimodal_transformer_tpu.training.train_state import (
        TrainState, adam, make_train_step,
    )

    hp = {"vocab_size": 40, "max_seq_len": 12, "input_modality": "image",
          "attn_window": 4, "encoder_dropout": 0.0, "decoder_dropout": 0.0,
          "pos_dropout": 0.0}
    model, _ = build_model(hp)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 32, 40, 1), jnp.float32)
    batch = {
        "x": x,
        "x_hw": jnp.asarray([[32, 40]] * 2, jnp.int32),
        "y_in": jnp.ones((2, 12), jnp.int32),
        "y_out": jnp.ones((2, 12), jnp.int32),
    }
    params = jax.jit(model.init)({"params": rng}, batch["x"], batch["x_hw"], batch["y_in"])[
        "params"
    ]
    step = make_train_step(model, vocab_size=40, teacher_forcing_prob=0.0, bf16_compute=True)
    skey = jax.random.PRNGKey(7)
    # the step donates its TrainState: give each call its own param buffers
    fresh = lambda: TrainState.create(jax.tree.map(jnp.copy, params), adam(1e-4))
    _, loss_f32 = step(fresh(), batch, skey)
    batch_bf16 = dict(batch, x=batch["x"].astype(jnp.bfloat16))
    _, loss_bf16 = step(fresh(), batch_bf16, skey)
    assert float(loss_f32) == float(loss_bf16)


def test_clip_norm_bounds_updates_and_zero_is_identity():
    """adam(clip_norm=c) caps the global gradient norm at c before the Adam
    moments; clip_norm=0 is exactly the unclipped transformation (reference
    parity — Lightning's default has no clipping)."""
    import jax
    import jax.numpy as jnp
    import optax

    from omr_a2s_multimodal_transformer_tpu.training.train_state import adam

    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    spike = {"w": jnp.full((4,), 1e6), "b": jnp.full((2,), -1e6)}

    clipped = adam(1e-4, clip_norm=1.0)
    st = clipped.init(params)
    _, st = clipped.update(spike, st, params)
    # after global-norm clipping the Adam moments see a norm-1 gradient
    inner = st[1] if isinstance(st, tuple) else st
    mu = inner[0].mu if hasattr(inner[0], "mu") else None
    assert mu is not None
    gnorm = optax.global_norm(mu)
    assert float(gnorm) <= 0.1 + 1e-6  # b1=0.9 -> mu = 0.1 * clipped grad

    plain = adam(1e-4, clip_norm=0.0)
    ref = optax.adam(1e-4, b1=0.9, b2=0.999, eps=1e-8)
    g = {"w": jnp.arange(4.0), "b": jnp.asarray([0.5, -0.5])}
    u1, _ = plain.update(g, plain.init(params), params)
    u2, _ = ref.update(g, ref.init(params), params)
    assert all(
        bool(jnp.allclose(a, b))
        for a, b in zip(jax.tree.leaves(u1), jax.tree.leaves(u2))
    )


def test_auto_resume_continues_epochs_and_keeps_best(dm, tmp_path):
    """Crash/restart recovery resumes at the saved epoch (not epoch 1: that
    would retrain `epochs` MORE epochs) and keeps the pre-crash best metric
    (not inf: a worse post-resume val must not overwrite a better 'best')."""
    import json

    vocab = dm.get_vocab()
    hparams = {
        "vocab_size": len(vocab),
        "max_seq_len": dm.get_max_seq_len(),
        "input_modality": "image",
        "attn_window": 10,
    }
    wdir = str(tmp_path / "weights")

    model, multimodal = build_model(hparams)
    t1 = Trainer(model, vocab, hparams, weights_dir=wdir,
                 run_dir=str(tmp_path / "r1"), epochs=2, patience=100,
                 check_val_every_n_epoch=1, bf16_compute=False,
                 multimodal=multimodal)
    t1.fit(dm)

    # simulate a pre-crash best that is BETTER than anything a short resumed
    # run will reach, so a best=inf reset would provably clobber it
    best_hp = os.path.join(wdir, "best", "hparams.json")
    meta = json.load(open(best_hp))
    meta["val_sym-er"] = 0.001
    json.dump(meta, open(best_hp, "w"))
    sentinel = os.path.getmtime(os.path.join(wdir, "best", "hparams.json"))

    model2, _ = build_model(hparams)
    t2 = Trainer(model2, vocab, hparams, weights_dir=wdir,
                 run_dir=str(tmp_path / "r2"), epochs=3, patience=100,
                 check_val_every_n_epoch=1, bf16_compute=False,
                 multimodal=multimodal)
    t2.fit(dm)  # auto_resume=True default

    rows = [json.loads(ln) for ln in open(os.path.join(str(tmp_path / "r2"), "metrics.jsonl"))
            if ln.strip()]
    resumed = [r for r in rows if "resumed_epoch" in r]
    assert resumed and resumed[0]["resumed_epoch"] == 2
    assert resumed[0]["resumed_best"] == pytest.approx(0.001)
    # only epoch 3 trained in the resumed run
    epochs_trained = sorted({r["epoch"] for r in rows if "train_loss" in r})
    assert epochs_trained == [3]
    # the artificially-better pre-crash best was NOT overwritten
    meta_after = json.load(open(best_hp))
    assert meta_after["val_sym-er"] == pytest.approx(0.001)
    assert os.path.getmtime(os.path.join(wdir, "best", "hparams.json")) == sentinel
