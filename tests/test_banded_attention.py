"""Banded attention must equal full attention with the windowed causal
mask, including pad-key biasing and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omr_a2s_multimodal_transformer_tpu.ops.attention import attend
from omr_a2s_multimodal_transformer_tpu.ops.banded_attention import banded_causal_attention
from omr_a2s_multimodal_transformer_tpu.ops import masks as M


def _full_reference(q, k, v, window, key_bias=None):
    l = q.shape[1]
    mask = M.windowed_causal_mask(l, window)[None, None]
    if key_bias is not None:
        mask = mask + key_bias[:, None, None, :]
    return attend(q, k, v, mask)


@pytest.mark.parametrize("l,window,chunk", [(257, 100, 128), (384, 128, 128), (100, 30, 128), (512, 100, None)])
def test_banded_matches_full(l, window, chunk):
    b, h, dh = 2, 4, 32
    q = jax.random.normal(jax.random.PRNGKey(0), (b, l, h, dh))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, l, h, dh))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, l, h, dh))
    out = jax.jit(lambda q, k, v: banded_causal_attention(q, k, v, window, chunk=chunk))(q, k, v)
    ref = jax.jit(lambda q, k, v: _full_reference(q, k, v, window))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_banded_with_pad_bias():
    b, l, h, dh, window = 2, 200, 2, 16, 50
    q = jax.random.normal(jax.random.PRNGKey(0), (b, l, h, dh))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, l, h, dh))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, l, h, dh))
    valid = jnp.arange(l)[None, :] < jnp.asarray([[150], [80]])[:, 0:1]
    bias = jnp.where(valid, 0.0, M.NEG_INF)
    out = jax.jit(lambda q, k, v: banded_causal_attention(q, k, v, window, key_bias=bias))(q, k, v)
    ref = jax.jit(lambda q, k, v: _full_reference(q, k, v, window, key_bias=bias))(q, k, v)
    # rows attending only to pad keys can differ; compare valid-query rows
    np.testing.assert_allclose(np.asarray(out)[0, :150], np.asarray(ref)[0, :150], atol=2e-5)
    np.testing.assert_allclose(np.asarray(out)[1, :80], np.asarray(ref)[1, :80], atol=2e-5)


def test_banded_gradients_match():
    b, l, h, dh, window = 1, 160, 2, 16, 40
    q = jax.random.normal(jax.random.PRNGKey(0), (b, l, h, dh))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, l, h, dh))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, l, h, dh))

    g1 = jax.jit(jax.grad(lambda q: banded_causal_attention(q, k, v, window).sum()))(q)
    g2 = jax.jit(jax.grad(lambda q: _full_reference(q, k, v, window).sum()))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=3e-5, rtol=3e-5)
