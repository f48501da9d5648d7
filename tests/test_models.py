"""Model smoke + consistency tests: shapes, KV-cache/full-forward
equivalence, windowed masks, mixer shapes, modality dispatch.

Everything is jitted (eager per-op compiles are prohibitively slow on the
test backend) and shapes are kept few and small.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omr_a2s_multimodal_transformer_tpu.models.multimodal import MultimodalTransformer
from omr_a2s_multimodal_transformer_tpu.models.transformer import UnimodalTransformer
from omr_a2s_multimodal_transformer_tpu.ops import masks as M

V = 23
MAXLEN = 8
B = 2
X_SHAPE = (B, 32, 48, 1)


@functools.lru_cache(maxsize=4)
def _setup(attn_window=-1):
    m = UnimodalTransformer(vocab_size=V, max_seq_len=MAXLEN, attn_window=attn_window)
    x = jax.random.uniform(jax.random.PRNGKey(2), X_SHAPE)
    hw = jnp.asarray([[32, 48], [16, 40]], jnp.int32)
    y_in = jnp.asarray([[1, 5, 6, 0], [1, 7, 0, 0]], jnp.int32)
    params = jax.jit(m.init)({"params": jax.random.PRNGKey(0)}, x, hw, y_in)
    return m, x, hw, y_in, params


def test_unimodal_forward_shapes():
    m, x, hw, y_in, params = _setup()
    logits = jax.jit(m.apply)(params, x, hw, y_in)
    assert logits.shape == (B, 4, V)
    assert np.isfinite(np.asarray(logits)).all()


def test_training_forward_with_dropout_runs():
    m, x, hw, y_in, params = _setup()
    fwd = jax.jit(functools.partial(m.apply, deterministic=False))
    logits = fwd(params, x, hw, y_in, rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("attn_window", [-1, 3])
def test_kv_cache_matches_full_forward(attn_window):
    """Incremental cached decode must reproduce the full-forward logits at
    every position (the reference decodes by full re-runs; we must be
    numerically equivalent)."""
    m, x, _, _, params = _setup(attn_window)
    steps = MAXLEN
    tokens = jax.random.randint(jax.random.PRNGKey(3), (B, steps), 1, V)

    # Full forward on the whole sequence once: causal masking makes
    # logits[:, t] identical to a forward on the prefix up to t.
    memory, _ = jax.jit(lambda p, x: m.apply(p, x, None, method=UnimodalTransformer.encode))(params, x)
    full = jax.jit(lambda p, t, mem: m.apply(p, t, mem, None, method=lambda mdl, *a: mdl.decoder(*a)))(
        params, tokens, memory
    )

    prefill = jax.jit(lambda p, x: m.apply(p, x, None, method=UnimodalTransformer.decode_prefill))
    cross, mem_valid = prefill(params, x)
    cache = m.apply(params, B, method=UnimodalTransformer.decode_init_cache)
    step_fn = jax.jit(
        lambda p, tok, pos, cache, cross: m.apply(
            p, tok, pos, cache, cross, None, method=UnimodalTransformer.decode_step
        )
    )
    for t in range(steps):
        lg, cache = step_fn(params, tokens[:, t], jnp.int32(t), cache, cross)
        np.testing.assert_allclose(np.asarray(lg), np.asarray(full[:, t]), atol=2e-4, rtol=1e-4)


def test_windowed_mask_semantics():
    mask = np.asarray(M.windowed_causal_mask(6, 2))
    for i in range(6):
        for j in range(6):
            expect = 0.0 if (j <= i and j >= i - 2) else M.NEG_INF
            assert mask[i, j] == expect


def test_rect_vs_prefix_mask():
    hw = jnp.asarray([[2, 3]], jnp.int32)
    rect = np.asarray(jax.jit(M.rect_valid_mask, static_argnums=(1, 2))(hw, 3, 4))[0].reshape(3, 4)
    assert rect.sum() == 6 and rect[:2, :3].all() and not rect[2].any() and not rect[:, 3].any()


@pytest.mark.parametrize("mixer", ["concat", "attn_img", "attn_audio", "attn_both"])
def test_multimodal_mixers(mixer):
    m = MultimodalTransformer(vocab_size=V, max_seq_len=MAXLEN, mixer_type=mixer)
    xi = jnp.ones((B, 32, 48, 1))
    xa = jnp.ones((B, 16, 24, 1))
    xi_hw = jnp.asarray([[32, 48], [20, 30]], jnp.int32)
    xa_hw = jnp.asarray([[16, 24], [16, 20]], jnp.int32)
    y_in = jnp.asarray([[1, 5, 6, 0], [1, 7, 0, 0]], jnp.int32)
    params = jax.jit(m.init)({"params": jax.random.PRNGKey(0)}, xi, xi_hw, xa, xa_hw, y_in)
    logits = jax.jit(m.apply)(params, xi, xi_hw, xa, xa_hw, y_in)
    assert logits.shape == (B, 4, V)

    mem, _ = jax.jit(
        lambda p, xi, xa, ih, ah: m.apply(p, xi, xa, ih, ah, method=MultimodalTransformer.encoder_forward)
    )(params, xi, xa, xi_hw, xa_hw)
    li = (32 // 16) * (48 // 8)
    la = (16 // 16) * (24 // 8)
    expected = {"concat": li + la, "attn_img": la, "attn_audio": li, "attn_both": li + la}[mixer]
    assert mem.shape[1] == expected

    if mixer == "attn_both":
        assert {"image_encoder", "audio_encoder", "decoder", "cross_attn"} <= set(params["params"].keys())


@pytest.mark.parametrize("mixer,query_mod", [("attn_img", "audio"), ("attn_audio", "image")])
def test_residual_mixer_is_query_passthrough_at_init(mixer, query_mod):
    """mixer_residual=True: memory = query + tanh(gate)*CrossAttn(query, kv)
    with gate init 0 — so at FRESH init (no parameter surgery) the memory
    must equal the query modality's unimodal memory exactly, regardless of
    what the fresh-random attention outputs. This is the property that lets
    the mixer start as a working unimodal system instead of the reference's
    fresh random projection (the measured no-latch basin, STATUS r4; the
    UNgated residual was measured in the same basin)."""
    m = MultimodalTransformer(vocab_size=V, max_seq_len=MAXLEN, mixer_type=mixer,
                              mixer_residual=True)
    xi = jnp.ones((B, 32, 48, 1))
    xa = jnp.ones((B, 16, 24, 1))
    xi_hw = jnp.asarray([[32, 48], [20, 30]], jnp.int32)
    xa_hw = jnp.asarray([[16, 24], [16, 20]], jnp.int32)
    y_in = jnp.asarray([[1, 5, 6, 0], [1, 7, 0, 0]], jnp.int32)
    params = jax.jit(m.init)({"params": jax.random.PRNGKey(0)}, xi, xi_hw, xa, xa_hw, y_in)
    assert "mix_gate" in params["params"]

    def fwd(p, modality):
        return m.apply(p, xi, xa, xi_hw, xa_hw, modality,
                       method=MultimodalTransformer.encoder_forward)

    mixed, _ = jax.jit(fwd, static_argnums=1)(params, "both")
    query_only, _ = jax.jit(fwd, static_argnums=1)(params, query_mod)
    np.testing.assert_array_equal(np.asarray(mixed), np.asarray(query_only))

    # with the gate opened, the attention path contributes: memory differs
    params2 = jax.tree.map(lambda x: x, params)
    params2["params"] = dict(params2["params"])
    params2["params"]["mix_gate"] = jnp.full_like(params["params"]["mix_gate"], 1.0)
    mixed2 = jax.jit(fwd, static_argnums=1)(params2, "both")[0]
    assert not np.allclose(np.asarray(mixed2), np.asarray(query_only))


def test_modality_dispatch():
    m = MultimodalTransformer(vocab_size=V, max_seq_len=MAXLEN, mixer_type="concat")
    xi = jnp.ones((1, 32, 48, 1))
    xa = jnp.ones((1, 16, 24, 1))
    y_in = jnp.asarray([[1, 5]], jnp.int32)
    params = jax.jit(m.init)({"params": jax.random.PRNGKey(0)}, xi, None, xa, None, y_in)
    for modality in ["image", "audio", "both"]:
        lg = jax.jit(m.apply, static_argnums=(6,))(params, xi, None, xa, None, y_in, modality)
        assert lg.shape == (1, 2, V)


def test_int8_kv_cache_close_to_f32():
    """cache_dtype="int8" (per-channel quantized cross K/V) must track the
    f32 decode step closely: small relative logit error, same ranking on
    clearly-separated logits."""
    m, x, _, _, params = _setup()
    m8 = UnimodalTransformer(vocab_size=V, max_seq_len=MAXLEN, cache_dtype="int8")
    tokens = jax.random.randint(jax.random.PRNGKey(3), (B, MAXLEN), 1, V)

    def roll(model):
        prefill = jax.jit(lambda p, x: model.apply(p, x, None, method=UnimodalTransformer.decode_prefill))
        cross, _ = prefill(params, x)
        cache = model.apply(params, B, method=UnimodalTransformer.decode_init_cache)
        step_fn = jax.jit(
            lambda p, tok, pos, cache, cross: model.apply(
                p, tok, pos, cache, cross, None, method=UnimodalTransformer.decode_step
            )
        )
        out = []
        for t in range(MAXLEN):
            lg, cache = step_fn(params, tokens[:, t], jnp.int32(t), cache, cross)
            out.append(np.asarray(lg))
        return np.stack(out, axis=1)  # [B, L, V]

    lf = roll(m)
    l8 = roll(m8)
    # int8 per-channel KV: logit error well under the logit spread
    err = np.abs(l8 - lf).max()
    spread = lf.std()
    assert err < 0.12 * spread, (err, spread)
    # int4 (TPU-native s4, two values/byte): coarser but still bounded
    m4 = UnimodalTransformer(vocab_size=V, max_seq_len=MAXLEN, cache_dtype="int4")
    l4 = roll(m4)
    err4 = np.abs(l4 - lf).max()
    assert err4 < 0.6 * spread, (err4, spread)
    assert err4 > 0  # actually quantized, not silently falling back
