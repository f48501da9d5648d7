"""Head-packed flash attention (fwd + custom bwd) vs XLA autodiff
(interpret mode; dropout paths run on real TPU only — the Pallas PRNG is
not modeled by the interpreter)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omr_a2s_multimodal_transformer_tpu.ops import masks as M
from omr_a2s_multimodal_transformer_tpu.ops.attention import attend
from omr_a2s_multimodal_transformer_tpu.ops.flash_packed import make_flash_attention_packed


def _xla_ref_packed(q, k, v, n_heads, kv_valid=None, causal=False, window=-1):
    """Reference on packed [B, L, H*Dh] tensors via ops.attention.attend."""
    b, lq, pd = q.shape
    lk, dh = k.shape[1], pd // n_heads
    split = lambda t: t.reshape(b, t.shape[1], n_heads, dh)
    mask = jnp.zeros((b, 1, lq, lk))
    if kv_valid is not None:
        mask = mask + M.key_valid_attn_mask(kv_valid)
    if causal:
        i = jnp.arange(lq)[:, None]
        j = jnp.arange(lk)[None, :]
        a = j <= i
        if window > 0:
            a &= j >= i - window
        mask = mask + jnp.where(a, 0.0, M.NEG_INF)[None, None]
    out = attend(split(q), split(k), split(v), mask)
    return out.reshape(b, lq, pd)


CASES = [
    # cross-attention to a wide memory with per-sample rectangles
    dict(b=2, h=4, lq=160, lk=384, dh=64, causal=False, window=-1, valid=True),
    # windowed causal self-attention
    dict(b=1, h=4, lq=256, lk=256, dh=64, causal=True, window=100, valid=False),
    # full causal
    dict(b=2, h=2, lq=192, lk=192, dh=64, causal=True, window=-1, valid=False),
]


@pytest.mark.parametrize("case", CASES)
def test_flash_packed_matches_xla(case):
    b, h, lq, lk, dh = case["b"], case["h"], case["lq"], case["lk"], case["dh"]
    pd = h * dh
    q = jax.random.normal(jax.random.PRNGKey(0), (b, lq, pd))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, lk, pd))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, lk, pd))
    kv_len = jnp.full((b,), lk, jnp.int32)
    if case["valid"]:
        kv_valid = jnp.arange(lk)[None, :] < jnp.asarray([lk, lk - 100])[:, None]
        kv_len = jnp.asarray([lk, lk - 100], jnp.int32)
    else:
        kv_valid = jnp.ones((b, lk), bool)

    flash = make_flash_attention_packed(
        n_heads=h, causal=case["causal"], window=case["window"], interpret=True)
    seed = jnp.int32(0)

    out = flash(q, k, v, kv_len, kv_valid, seed)
    ref = _xla_ref_packed(q, k, v, h, kv_valid, case["causal"], case["window"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)

    w = jnp.cos(jnp.arange(pd))

    def loss_flash(q, k, v):
        return (flash(q, k, v, kv_len, kv_valid, seed) * w).sum()

    def loss_ref(q, k, v):
        return (_xla_ref_packed(q, k, v, h, kv_valid, case["causal"], case["window"]) * w).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5, rtol=5e-5, err_msg=f"d{name}"
        )


def test_flash_packed_nonsquare_head_dim_rejected_gracefully():
    """pd must be divisible by n_heads (the packed layout's contract)."""
    flash = make_flash_attention_packed(n_heads=4, interpret=True)
    q = jnp.ones((1, 8, 256))
    k = v = jnp.ones((1, 8, 256))
    out = flash(q, k, v, jnp.full((1,), 8, jnp.int32), jnp.ones((1, 8), bool), jnp.int32(0))
    assert out.shape == (1, 8, 256)
