"""Flash-attention kernel vs the XLA reference implementation
(interpret mode on CPU; the same kernel compiles for TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omr_a2s_multimodal_transformer_tpu.ops.attention import attend
from omr_a2s_multimodal_transformer_tpu.ops.flash_attention import flash_attention
from omr_a2s_multimodal_transformer_tpu.ops import masks as M


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


def _reference(q, k, v, kv_len=None, causal=False, window=-1):
    # q/k/v: [B, H, L, D] -> attend() wants [B, L, H, D]
    b, h, lq, d = q.shape
    lk = k.shape[2]
    mask = jnp.zeros((b, 1, lq, lk))
    if kv_len is not None:
        mask = mask + M.key_valid_attn_mask(M.length_valid_mask(kv_len, lk))
    if causal:
        i = jnp.arange(lq)[:, None]
        j = jnp.arange(lk)[None, :]
        allowed = j <= i
        if window > 0:
            allowed &= j >= i - window
        mask = mask + jnp.where(allowed, 0.0, M.NEG_INF)[None, None]
    out = attend(
        jnp.transpose(q, (0, 2, 1, 3)), jnp.transpose(k, (0, 2, 1, 3)),
        jnp.transpose(v, (0, 2, 1, 3)), mask,
    )
    return jnp.transpose(out, (0, 2, 1, 3))


@pytest.mark.parametrize(
    "case",
    [
        dict(b=2, h=2, lq=128, lk=128, d=64, causal=False, window=-1, kv=None),
        dict(b=2, h=2, lq=128, lk=256, d=64, causal=False, window=-1, kv=[200, 96]),
        dict(b=1, h=4, lq=256, lk=256, d=64, causal=True, window=-1, kv=None),
        dict(b=1, h=2, lq=256, lk=256, d=64, causal=True, window=100, kv=None),
        dict(b=2, h=1, lq=100, lk=300, d=48, causal=False, window=-1, kv=[300, 177]),  # unaligned
    ],
)
def test_flash_matches_reference(case):
    q = _rand((case["b"], case["h"], case["lq"], case["d"]), 0)
    k = _rand((case["b"], case["h"], case["lk"], case["d"]), 1)
    v = _rand((case["b"], case["h"], case["lk"], case["d"]), 2)
    kv_len = None if case["kv"] is None else jnp.asarray(case["kv"], jnp.int32)
    out = flash_attention(
        q, k, v, kv_len, causal=case["causal"], window=case["window"], interpret=True
    )
    ref = _reference(q, k, v, kv_len, case["causal"], case["window"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
