"""Differentiable flash attention vs XLA autodiff (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omr_a2s_multimodal_transformer_tpu.ops.attention import attend
from omr_a2s_multimodal_transformer_tpu.ops.flash_attention_bwd import make_flash_attention
from omr_a2s_multimodal_transformer_tpu.ops import masks as M


def _xla_ref(q, k, v, kv_len=None, causal=False, window=-1):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    mask = jnp.zeros((b, 1, lq, lk))
    if kv_len is not None:
        mask = mask + M.key_valid_attn_mask(M.length_valid_mask(kv_len, lk))
    if causal:
        i = jnp.arange(lq)[:, None]
        j = jnp.arange(lk)[None, :]
        a = j <= i
        if window > 0:
            a &= j >= i - window
        mask = mask + jnp.where(a, 0.0, M.NEG_INF)[None, None]
    out = attend(jnp.transpose(q, (0, 2, 1, 3)), jnp.transpose(k, (0, 2, 1, 3)),
                 jnp.transpose(v, (0, 2, 1, 3)), mask)
    return jnp.transpose(out, (0, 2, 1, 3))


CASES = [
    dict(b=2, h=2, lq=128, lk=256, d=64, causal=False, window=-1, kv=[256, 100]),
    dict(b=1, h=2, lq=256, lk=256, d=64, causal=True, window=100, kv=None),
    dict(b=1, h=1, lq=200, lk=200, d=48, causal=True, window=-1, kv=None),
]


@pytest.mark.parametrize("case", CASES)
def test_flash_bwd_matches_xla(case):
    q = jax.random.normal(jax.random.PRNGKey(0), (case["b"], case["h"], case["lq"], case["d"]))
    k = jax.random.normal(jax.random.PRNGKey(1), (case["b"], case["h"], case["lk"], case["d"]))
    v = jax.random.normal(jax.random.PRNGKey(2), (case["b"], case["h"], case["lk"], case["d"]))
    kv_len = jnp.asarray(case["kv"], jnp.int32) if case["kv"] else jnp.full((case["b"],), case["lk"], jnp.int32)

    flash = make_flash_attention(causal=case["causal"], window=case["window"], interpret=True)
    kv_valid_full = jnp.ones((case["b"], case["lk"]), bool)

    out = flash(q, k, v, kv_len, kv_valid_full)
    ref = _xla_ref(q, k, v, kv_len, case["causal"], case["window"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)

    def loss_flash(q, k, v):
        return (flash(q, k, v, kv_len, kv_valid_full) * jnp.cos(jnp.arange(case["d"]))).sum()

    def loss_ref(q, k, v):
        return (_xla_ref(q, k, v, kv_len, case["causal"], case["window"]) * jnp.cos(jnp.arange(case["d"]))).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5, rtol=5e-5,
                                   err_msg=f"d{name} mismatch")


def test_flash_bwd_non_prefix_kv_mask():
    """Arbitrary boolean kv validity (e.g. concat-mixer fused memories where
    valid positions are NOT a prefix) in forward and gradients."""
    b, h, lq, lk, d = 2, 2, 128, 256, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, lq, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, lk, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, lk, d))
    kv_len = jnp.full((b,), lk, jnp.int32)
    kv_valid = jax.random.bernoulli(jax.random.PRNGKey(3), 0.7, (b, lk))
    flash = make_flash_attention(interpret=True)

    out = flash(q, k, v, kv_len, kv_valid)
    ref = _xla_ref(q, k, v)
    # reference with the scattered mask
    mask = jnp.where(kv_valid, 0.0, M.NEG_INF)[:, None, None, :]
    from omr_a2s_multimodal_transformer_tpu.ops.attention import attend
    ref = jnp.transpose(attend(jnp.transpose(q, (0, 2, 1, 3)), jnp.transpose(k, (0, 2, 1, 3)),
                               jnp.transpose(v, (0, 2, 1, 3)), mask), (0, 2, 1, 3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)

    gf = jax.grad(lambda k_: flash(q, k_, v, kv_len, kv_valid).sum())(k)
    gr = jax.grad(lambda k_: jnp.transpose(
        attend(jnp.transpose(q, (0, 2, 1, 3)), jnp.transpose(k_, (0, 2, 1, 3)),
               jnp.transpose(v, (0, 2, 1, 3)), mask), (0, 2, 1, 3)).sum())(k)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-5, rtol=5e-5)
