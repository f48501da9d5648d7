"""Decoder banded-path equivalence: the long-sequence windowed decoder must
produce identical logits to the full masked-matrix path."""

import jax
import jax.numpy as jnp
import numpy as np

from omr_a2s_multimodal_transformer_tpu.models.decoder import KernDecoder

V = 29


def test_decoder_banded_equals_full():
    l = 300  # > 2*chunk(128) -> banded kicks in at window 50
    dec_w = KernDecoder(vocab_size=V, max_seq_len=512, attn_window=50, n_layers=2)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, l), 1, V)
    ids = ids.at[0, 250:].set(0)  # pads
    mem = jax.random.normal(jax.random.PRNGKey(1), (2, 40, 256))
    mem_valid = jnp.arange(40)[None, :] < jnp.asarray([[40], [30]])[:, 0:1]
    params = jax.jit(dec_w.init)({"params": jax.random.PRNGKey(2)}, ids, mem, mem_valid)

    banded = jax.jit(dec_w.apply)(params, ids, mem, mem_valid)

    # force the full-matrix path by evaluating at a short length with the
    # same weights: compare a 300-length full run via a decoder whose
    # threshold is raised (chunk trick: window 50 -> use chunk so l <= 2*chunk)
    dec_full = KernDecoder(vocab_size=V, max_seq_len=512, attn_window=50, n_layers=2)
    # monkeypatch threshold by calling the layer stack with masks directly:
    from omr_a2s_multimodal_transformer_tpu.ops import masks as M

    def full_forward(params, ids, mem, mem_valid):
        def run(mdl):
            x = mdl._embed(ids) + mdl._pe()[None, : ids.shape[1]]
            self_mask = M.windowed_causal_mask(ids.shape[1], 50)[None, None]
            key_bias = jnp.where(ids != 0, 0.0, M.NEG_INF)
            self_mask = self_mask + key_bias[:, None, None, :]
            mem_mask = M.key_valid_attn_mask(mem_valid)
            for layer in mdl.layers:
                x_ = layer(x, mem, self_mask, mem_mask, True)
                x = x_
            return mdl.out_layer(x)

        return dec_full.apply(params, method=run)

    full = jax.jit(full_forward)(params, ids, mem, mem_valid)
    # valid (non-pad) positions must match exactly
    np.testing.assert_allclose(np.asarray(banded)[0, :250], np.asarray(full)[0, :250], atol=3e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(banded)[1], np.asarray(full)[1], atol=3e-4, rtol=1e-4)


def test_decoder_flash_cross_matches_default():
    """use_flash_cross (head-packed Pallas, interpret mode on CPU) must match
    the XLA cross-attention path in deterministic forward. The decoder now
    auto-selects interpret mode on CPU backends, so no monkeypatch needed."""
    dec = KernDecoder(vocab_size=V, max_seq_len=16, n_layers=2)
    dec_flash = KernDecoder(vocab_size=V, max_seq_len=16, n_layers=2, use_flash_cross=True)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 10), 1, V)
    mem = jax.random.normal(jax.random.PRNGKey(1), (2, 160, 256))
    mem_valid = jnp.arange(160)[None, :] < jnp.asarray([[160], [100]])[:, 0:1]
    params = dec.init({"params": jax.random.PRNGKey(2)}, ids, mem, mem_valid)

    base = dec.apply(params, ids, mem, mem_valid)
    flash = dec_flash.apply(params, ids, mem, mem_valid)
    # bf16 tolerance: the decoder casts flash q/k/v to bfloat16 (TPU dtype
    # policy); strict f32 kernel parity is covered by tests/test_flash_packed.
    np.testing.assert_allclose(np.asarray(flash), np.asarray(base), atol=3e-2, rtol=3e-2)

    # Training mode runs attention-weight dropout inside the kernel; the TPU
    # core PRNG has no CPU/interpret lowering, so this part is TPU-only.
    if jax.default_backend() != "tpu":
        return

    def loss(p):
        out = dec_flash.apply(
            p, ids, mem, mem_valid, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(7)},
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(g))
