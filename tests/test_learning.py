"""Learning regression: full-batch Adam on a tiny synthetic corpus must
drive the teacher-forced loss well below its initial value. Guards the whole
optimization path (grads, optimizer wiring, masks) — a convergence bug shows
up here long before an SER eval would."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from omr_a2s_multimodal_transformer_tpu.data.dataset import ARDataset
from omr_a2s_multimodal_transformer_tpu.data.collate import collate_unimodal, IMAGE_PAD_VALUE
from omr_a2s_multimodal_transformer_tpu.models import build_model
from omr_a2s_multimodal_transformer_tpu.training.losses import cross_entropy_ignore_pad


@pytest.mark.slow
def test_loss_decreases_under_training(tmp_path):
    ds = ARDataset(
        "synthetic", "train", "kern", "image", synthetic=True,
        synthetic_kwargs=dict(n=4, img_height_range=(32, 33), img_width_range=(48, 64),
                              audio_seconds_range=(0.2, 0.3), n_measures=1),
        cache_root=str(tmp_path),
    )
    samples = [ds[i] for i in range(len(ds))]
    batch = {k: jnp.asarray(v) for k, v in collate_unimodal(samples, IMAGE_PAD_VALUE).items()}

    hp = {"vocab_size": len(ds.vocab), "max_seq_len": ds.max_seq_len,
          "input_modality": "image", "attn_window": 10,
          "encoder_dropout": 0.0, "decoder_dropout": 0.0, "pos_dropout": 0.0}
    model, _ = build_model(hp)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, batch["x"], batch["x_hw"], batch["y_in"]
    )["params"]

    def loss_fn(p):
        logits = model.apply({"params": p}, batch["x"], batch["x_hw"], batch["y_in"])
        return cross_entropy_ignore_pad(logits, batch["y_out"])

    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    params, opt_state, first = step(params, opt_state)
    for _ in range(150):
        params, opt_state, loss = step(params, opt_state)
    first, loss = float(first), float(loss)
    assert np.isfinite(loss)
    assert loss < first * 0.25, f"loss did not drop: {first:.3f} -> {loss:.3f}"
