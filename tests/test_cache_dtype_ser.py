"""SER-level regression for the quantized decode cache modes (VERDICT r2 #2).

int8/int4 cross-KV caches are the production decode configurations
(bench.py, serving) — a logit-error bound alone doesn't say what they do to
the METRIC. Here a tiny model memorizes a fixed 4-sample corpus, then the
same checkpoint decodes under every cache_dtype; the Sym-ER deltas vs the
exact f32 decode must stay within stated bounds. (The corpus-scale table at
production shapes lives in tools/eval_cache_dtypes.py / STATUS.md.)"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from omr_a2s_multimodal_transformer_tpu.data.collate import IMAGE_PAD_VALUE, collate_unimodal
from omr_a2s_multimodal_transformer_tpu.data.dataset import ARDataset
from omr_a2s_multimodal_transformer_tpu.models import build_model
from omr_a2s_multimodal_transformer_tpu.training.decode import cut_at_eos, greedy_decode_fn
from omr_a2s_multimodal_transformer_tpu.training.losses import cross_entropy_ignore_pad
from omr_a2s_multimodal_transformer_tpu.utils.metrics import compute_ed_metrics


@pytest.mark.slow
def test_int8_int4_cache_ser_delta_bounded(tmp_path):
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

    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    # Teacher-forced loss must get LOW, not just <1: free-running decode
    # compounds per-token errors, so partial memorization still yields a
    # huge SER (observed: loss 0.9 -> SER 52).
    loss = None
    for i in range(2400):
        params, opt_state, loss = step(params, opt_state)
        if i % 50 == 49 and float(loss) < 0.08:
            break
    assert float(loss) < 0.08, f"memorization failed (loss {float(loss):.3f}); SER deltas meaningless"

    gt = []
    eos = ds.vocab.eos_id
    for row in np.asarray(batch["y_out"]):
        ids = [int(t) for t in row if t != 0]
        if eos in ids:
            ids = ids[: ids.index(eos)]
        gt.append([ds.vocab.i2w[i] for i in ids])

    def ser_for(cache_dtype: str) -> float:
        m = build_model(dict(hp, cache_dtype=cache_dtype))[0]
        decode = jax.jit(greedy_decode_fn(m, ds.max_seq_len, sos_id=ds.vocab.sos_id, eos_id=eos))
        tokens, _ = decode({"params": params}, batch["x"], batch["x_hw"])
        pred_ids, _ = cut_at_eos(np.asarray(tokens), np.asarray(tokens), eos)
        preds = [[ds.vocab.i2w[i] for i in row] for row in pred_ids]
        return compute_ed_metrics(gt, preds)["sym-er"]

    ser = {d: ser_for(d) for d in ("float32", "bfloat16", "int8", "int4")}
    # exact/near-exact modes agree closely; quantized modes within stated bounds
    assert abs(ser["bfloat16"] - ser["float32"]) <= 5.0, ser
    assert abs(ser["int8"] - ser["float32"]) <= 5.0, ser
    assert abs(ser["int4"] - ser["float32"]) <= 12.0, ser
    # the memorizing model must actually be good, or the deltas prove nothing
    assert ser["float32"] <= 20.0, ser
