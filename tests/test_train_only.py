"""--train_only freezing: only the named top-level param groups may move
(the warm-started mixer recipe: frozen unimodal donors + trainable
cross_attn/mix_gate — a full fine-tune at mixer LRs destroys the donor)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from omr_a2s_multimodal_transformer_tpu.models.multimodal import MultimodalTransformer
from omr_a2s_multimodal_transformer_tpu.training.train_state import TrainState, adam, make_train_step

V, MAXLEN, B = 40, 8, 2


def _batch():
    return {
        "xi": jnp.ones((B, 32, 48, 1)),
        "xi_hw": jnp.asarray([[32, 48], [20, 30]], jnp.int32),
        "xa": jnp.ones((B, 16, 24, 1)),
        "xa_hw": jnp.asarray([[16, 24], [16, 20]], jnp.int32),
        "y_in": jnp.asarray([[1, 5, 6, 0], [1, 7, 0, 0]], jnp.int32),
        "y_out": jnp.asarray([[5, 6, 2, 0], [7, 2, 0, 0]], jnp.int32),
    }


def test_train_only_freezes_unlisted_groups():
    m = MultimodalTransformer(vocab_size=V, max_seq_len=MAXLEN, mixer_type="attn_img",
                              mixer_residual=True, encoder_dropout=0.0,
                              decoder_dropout=0.0, pos_dropout=0.0)
    b = _batch()
    params = jax.jit(m.init)({"params": jax.random.PRNGKey(0)},
                             b["xi"], b["xi_hw"], b["xa"], b["xa_hw"], b["y_in"])["params"]
    # snapshot before the step: the train step donates the state, so the
    # original param buffers are deleted afterwards
    before = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    state = TrainState.create(params, adam(1e-2, train_only=("cross_attn", "mix_gate")))
    step = make_train_step(m, vocab_size=V, teacher_forcing_prob=0.0,
                           bf16_compute=False, multimodal=True)
    state2, loss = step(state, b, jax.random.PRNGKey(1), "both")
    assert np.isfinite(float(loss))

    # after ONE step only the gate can move: at tanh(0)=0 the gate
    # multiplies cross_attn's output, so cross_attn's gradient is exactly
    # zero until the gate opens (the zero-init-gate bootstrap)
    gate_moved = not np.array_equal(before["mix_gate"], np.asarray(state2.params["mix_gate"]))
    assert gate_moved
    for a, c in zip(jax.tree.leaves(before["cross_attn"]),
                    jax.tree.leaves(state2.params["cross_attn"])):
        np.testing.assert_array_equal(a, np.asarray(c))

    # second step: gate != 0 -> cross_attn now receives gradient and moves
    ca_before2 = jax.tree.map(lambda x: np.asarray(x).copy(), state2.params["cross_attn"])
    state3, _ = step(state2, b, jax.random.PRNGKey(2), "both")
    moved = any(
        not np.array_equal(a, np.asarray(c))
        for a, c in zip(jax.tree.leaves(ca_before2),
                        jax.tree.leaves(state3.params["cross_attn"]))
    )
    assert moved

    for k in ("image_encoder", "audio_encoder", "decoder"):
        for a, c in zip(jax.tree.leaves(before[k]), jax.tree.leaves(state3.params[k])):
            np.testing.assert_array_equal(a, np.asarray(c))
