"""Checkpoint tests: orbax save/restore round-trip, multimodal split,
hparams sidecar."""

import jax
import jax.numpy as jnp
import numpy as np

from omr_a2s_multimodal_transformer_tpu.models.multimodal import MultimodalTransformer
from omr_a2s_multimodal_transformer_tpu.training import checkpoint as C

V, MAXLEN = 17, 8


def _mm_params():
    m = MultimodalTransformer(vocab_size=V, max_seq_len=MAXLEN, mixer_type="attn_both")
    xi = jnp.ones((1, 32, 48, 1))
    xa = jnp.ones((1, 16, 24, 1))
    y_in = jnp.asarray([[1, 5]], jnp.int32)
    return m, jax.jit(m.init)({"params": jax.random.PRNGKey(0)}, xi, None, xa, None, y_in)["params"]


def test_save_restore_roundtrip(tmp_path):
    _, params = _mm_params()
    path = str(tmp_path / "ckpt")
    state = {"params": jax.tree.map(np.asarray, params), "step": 7}
    C.save_checkpoint(path, state, hparams={"vocab_size": V, "max_seq_len": MAXLEN, "input_modality": "both"})
    restored = C.restore_checkpoint(path)
    assert restored["step"] == 7
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored["params"], state["params"],
    )
    hp = C.load_hparams(path)
    assert hp["vocab_size"] == V


def test_split_multimodal(tmp_path):
    from omr_a2s_multimodal_transformer_tpu.models.transformer import UnimodalTransformer

    _, params = _mm_params()
    img, audio = C.split_multimodal_params(params)
    assert set(img.keys()) == {"encoder", "decoder"}
    assert set(audio.keys()) == {"encoder", "decoder"}
    np.testing.assert_array_equal(
        np.asarray(img["encoder"]["block0"]["conv1"]["kernel"]),
        np.asarray(params["image_encoder"]["block0"]["conv1"]["kernel"]),
    )
    # split params drive a unimodal forward directly
    um = UnimodalTransformer(vocab_size=V, max_seq_len=MAXLEN)
    logits = jax.jit(um.apply)(
        {"params": img}, jnp.ones((1, 32, 48, 1)), None, jnp.asarray([[1, 2]], jnp.int32)
    )
    assert logits.shape == (1, 2, V)


def test_stitch_multimodal_roundtrips_split():
    import pytest

    _, params = _mm_params()
    img, audio = C.split_multimodal_params(params)
    # scale the unimodal trees so the stitch is detectable
    img2 = jax.tree.map(lambda x: x * 2.0, img)
    audio3 = jax.tree.map(lambda x: x * 3.0, audio)
    out = C.stitch_multimodal_params(params, img2, audio3, decoder_from="image")
    np.testing.assert_allclose(
        np.asarray(out["image_encoder"]["block0"]["conv1"]["kernel"]),
        2.0 * np.asarray(params["image_encoder"]["block0"]["conv1"]["kernel"]))
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(out["audio_encoder"])[0]),
        3.0 * np.asarray(jax.tree.leaves(params["audio_encoder"])[0]))
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(out["decoder"])[0]),
        2.0 * np.asarray(jax.tree.leaves(params["decoder"])[0]))
    # cross_attn (mixer-only) keeps the fresh init
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(out["cross_attn"])[0]),
        np.asarray(jax.tree.leaves(params["cross_attn"])[0]))
    # decoder_from=audio donates the audio decoder
    out_a = C.stitch_multimodal_params(params, img2, audio3, decoder_from="audio")
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(out_a["decoder"])[0]),
        3.0 * np.asarray(jax.tree.leaves(params["decoder"])[0]))
    # geometry mismatch fails loudly
    bad = jax.tree.map(lambda x: x, img)
    bad["encoder"]["block0"]["conv1"]["kernel"] = jnp.zeros((1, 1, 1, 1))
    with pytest.raises(ValueError, match="shape mismatch"):
        C.stitch_multimodal_params(params, bad, None)
    with pytest.raises(ValueError, match="decoder_from"):
        C.stitch_multimodal_params(params, img, audio, decoder_from="nope")


def test_warm_start_from_unimodal_checkpoints(tmp_path):
    """Unimodal legs saved to disk warm-start a mixer run's encoders+decoder
    while cross_attn stays fresh and the optimizer restarts at step 0."""
    from omr_a2s_multimodal_transformer_tpu.training.loop import Trainer

    model, params = _mm_params()
    img, audio = C.split_multimodal_params(params)
    img_path, audio_path = str(tmp_path / "img_ck"), str(tmp_path / "aud_ck")
    C.save_checkpoint(img_path, {"params": jax.tree.map(lambda x: np.asarray(x) * 2.0, img)})
    C.save_checkpoint(audio_path, {"params": jax.tree.map(lambda x: np.asarray(x) * 3.0, audio)})

    hp = {"vocab_size": V, "max_seq_len": MAXLEN}
    tr = Trainer(model, {"<pad>": 0}, hp, weights_dir=str(tmp_path / "w"),
                 run_dir=str(tmp_path / "r"), multimodal=True)
    sample = {"xi": np.ones((1, 32, 48, 1), np.float32), "xi_hw": np.asarray([[32, 48]]),
              "xa": np.ones((1, 16, 24, 1), np.float32), "xa_hw": np.asarray([[16, 24]]),
              "y_in": np.asarray([[1, 5]], np.int32)}
    tr.init_state(sample)
    fresh_cross = np.asarray(jax.tree.leaves(tr.state.params["cross_attn"])[0]).copy()
    tr.warm_start_from_unimodal(img_path, audio_path, decoder_from="audio")
    np.testing.assert_allclose(
        np.asarray(tr.state.params["image_encoder"]["block0"]["conv1"]["kernel"]),
        2.0 * np.asarray(params["image_encoder"]["block0"]["conv1"]["kernel"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(tr.state.params["decoder"])[0]),
        3.0 * np.asarray(jax.tree.leaves(params["decoder"])[0]), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(tr.state.params["cross_attn"])[0]), fresh_cross)
    assert int(tr.state.step) == 0


def test_save_split_checkpoints_cli_flow(tmp_path):
    _, params = _mm_params()
    path = str(tmp_path / "both_attn_both_kern")
    C.save_checkpoint(
        path,
        {"params": jax.tree.map(np.asarray, params)},
        hparams={"vocab_size": V, "max_seq_len": MAXLEN, "input_modality": "both",
                 "mixer_type": "attn_both", "teacher_forcing_modality_prob": 0.2},
    )
    img_path, audio_path = C.save_split_checkpoints(path)
    for p, modality in [(img_path, "image"), (audio_path, "audio")]:
        hp = C.load_hparams(p)
        assert hp["input_modality"] == modality
        assert "mixer_type" not in hp
        restored = C.restore_checkpoint(p)
        assert set(restored["params"].keys()) == {"encoder", "decoder"}
