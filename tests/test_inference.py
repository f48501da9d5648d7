"""End-to-end on-device pipeline tests: raw image/audio -> tokens, and
beam search sanity vs greedy."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from omr_a2s_multimodal_transformer_tpu.inference import (
    make_audio_transcriber,
    make_image_transcriber,
)
from omr_a2s_multimodal_transformer_tpu.models.transformer import UnimodalTransformer
from omr_a2s_multimodal_transformer_tpu.training.decode import beam_decode_fn, greedy_decode_fn

V, MAXLEN = 19, 8


@functools.lru_cache(maxsize=1)
def _img_model():
    m = UnimodalTransformer(vocab_size=V, max_seq_len=MAXLEN)
    x = jnp.ones((2, 32, 48, 1))
    params = jax.jit(m.init)(
        {"params": jax.random.PRNGKey(0)}, x, None, jnp.ones((2, 4), jnp.int32)
    )
    return m, params


def test_image_pipeline_raw_to_tokens():
    m, params = _img_model()
    f = make_image_transcriber(m, sos_id=1, eos_id=V - 1)
    raw = np.full((2, 32, 48), 255, np.uint8)
    raw[:, 10:20, 5:40] = 0
    hw = jnp.asarray([[32, 48], [32, 30]], jnp.int32)
    tokens, scores = f(params, jnp.asarray(raw), hw)
    tokens = np.asarray(tokens)
    assert tokens.shape == (2, MAXLEN)
    assert ((tokens >= 0) & (tokens < V)).all()


def test_audio_pipeline_raw_to_tokens():
    # audio model: spectrogram height is the fixed 195 bins -> use a model
    # initialized at that height
    m = UnimodalTransformer(vocab_size=V, max_seq_len=MAXLEN)
    wave = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4096)), jnp.float32)
    n = jnp.asarray([4096, 2048], jnp.int32)
    from omr_a2s_multimodal_transformer_tpu.ops.stft import log_spectrogram

    spec = log_spectrogram(wave, n)
    x = spec[..., None]
    params = jax.jit(m.init)(
        {"params": jax.random.PRNGKey(0)}, x, None, jnp.ones((2, 4), jnp.int32)
    )
    f = make_audio_transcriber(m, sos_id=1, eos_id=V - 1)
    tokens, _ = f(params, wave, n)
    assert np.asarray(tokens).shape == (2, MAXLEN)


def test_beam_size1_matches_greedy():
    m, params = _img_model()
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 32, 48, 1))
    greedy = jax.jit(greedy_decode_fn(m, MAXLEN, 1, V - 1))
    beam1 = jax.jit(beam_decode_fn(m, MAXLEN, 1, V - 1, beam_size=1))
    gt, _ = greedy(params, x, None)
    bt, _ = beam1(params, x, None)
    # identical until (and including) the first eos of each row
    for g_row, b_row in zip(np.asarray(gt), np.asarray(bt)):
        end = np.nonzero(g_row == V - 1)[0]
        k = int(end[0]) + 1 if len(end) else MAXLEN
        np.testing.assert_array_equal(g_row[:k], b_row[:k])


def test_beam_logprob_not_worse_than_greedy():
    m, params = _img_model()
    x = jax.random.uniform(jax.random.PRNGKey(6), (2, 32, 48, 1))
    beam4 = jax.jit(beam_decode_fn(m, MAXLEN, 1, V - 1, beam_size=4))
    beam1 = jax.jit(beam_decode_fn(m, MAXLEN, 1, V - 1, beam_size=1))
    _, s4 = beam4(params, x, None)
    _, s1 = beam1(params, x, None)
    assert (np.asarray(s4) >= np.asarray(s1) - 1e-4).all()


def test_beam_multimodal_runs():
    from omr_a2s_multimodal_transformer_tpu.models.multimodal import MultimodalTransformer

    m = MultimodalTransformer(vocab_size=V, max_seq_len=MAXLEN, mixer_type="concat")
    xi = jnp.ones((2, 32, 48, 1))
    xa = jnp.ones((2, 16, 24, 1))
    xi_hw = jnp.asarray([[32, 48]] * 2, jnp.int32)
    xa_hw = jnp.asarray([[16, 24]] * 2, jnp.int32)
    params = jax.jit(m.init)(
        {"params": jax.random.PRNGKey(0)}, xi, xi_hw, xa, xa_hw, jnp.ones((2, 4), jnp.int32)
    )
    beam = jax.jit(beam_decode_fn(m, MAXLEN, 1, V - 1, beam_size=2, multimodal=True))
    tokens, scores = beam(params, xi, xi_hw, xa, xa_hw)
    assert np.asarray(tokens).shape == (2, MAXLEN)
    assert np.isfinite(np.asarray(scores)).all()
