"""Rank-1 (channel x token) int4 cross-KV quantization.

Channel-only int4 scales let one outlier position — notably padded memory
columns, which prefill cannot mask — inflate a channel's scale for every
position (measured +6.2 SER at corpus scale, reports/cache_dtype_ser.json
round 4 pre-fix). The rank-1 scheme adds a residual per-token scale; its
folds live in ops/attention.py:attend_packed_single_query (K tscale into
the [B,S,H] logits, V tscale into the softmax weights).

Reference parity note: the reference has no quantized decode at all
(greedy f32 decode, /root/reference/src/transformer/model.py:170-199);
this subsystem is a TPU-side serving addition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omr_a2s_multimodal_transformer_tpu.models.transformer import UnimodalTransformer
from omr_a2s_multimodal_transformer_tpu.ops.attention import attend_packed_single_query

QMAX = 7.0


def _outlier_tensor(rng, b=2, s=256, d=128, tail=48, mag=8.0):
    t = rng.normal(size=(b, s, d)).astype(np.float32)
    t[:, s - tail:, :] *= mag  # pad-region garbage through k/v projections
    return jnp.asarray(t)


def _quant_channel_only(t):
    s = jnp.maximum(jnp.max(jnp.abs(t), axis=1), 1e-8) / QMAX
    q = jnp.clip(jnp.round(t / s[:, None, :]), -QMAX, QMAX)
    return q * s[:, None, :]


def _quant_rank1(t):
    s_c = jnp.maximum(jnp.max(jnp.abs(t), axis=1), 1e-8)
    t1 = t / s_c[:, None, :]
    s_t = jnp.maximum(jnp.max(jnp.abs(t1), axis=2), 1e-8) / QMAX
    q = jnp.clip(jnp.round(t1 / s_t[:, :, None]), -QMAX, QMAX)
    return q * s_t[:, :, None] * s_c[:, None, :], q, s_c, s_t


def test_rank1_beats_channel_only_under_position_outliers():
    t = _outlier_tensor(np.random.default_rng(0))
    r_chan = _quant_channel_only(t)
    r_r1, *_ = _quant_rank1(t)
    valid = slice(0, 256 - 48)
    err_chan = jnp.abs(r_chan - t)[:, valid, :]
    err_r1 = jnp.abs(r_r1 - t)[:, valid, :]
    # the whole point: valid-region error collapses (measured ~4.6x max,
    # ~5.9x rms on this construction; assert a conservative 3x)
    assert float(err_r1.max()) < float(err_chan.max()) / 3.0
    assert float(jnp.sqrt((err_r1**2).mean())) < float(jnp.sqrt((err_chan**2).mean())) / 3.0


def test_tscale_folds_match_explicit_dequant():
    """attend with (int4, s_c, s_t) == attend with explicitly dequantized
    bf16 K/V — the folds are exact algebra, so only bf16 dot noise remains."""
    rng = np.random.default_rng(1)
    b, s, d, h = 2, 64, 32, 4
    k = _outlier_tensor(rng, b, s, d, tail=8)
    v = _outlier_tensor(rng, b, s, d, tail=8, mag=5.0)
    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    bias = jnp.where(jnp.arange(s)[None, :] < s - 8, 0.0, -1e9).astype(jnp.float32)
    bias = jnp.broadcast_to(bias, (b, s))

    rk, qk, sck, stk = _quant_rank1(k)
    rv, qv, scv, stv = _quant_rank1(v)
    out_q = attend_packed_single_query(
        q, qk.astype(jnp.int4), qv.astype(jnp.int4), h, bias,
        k_scale=sck, v_scale=scv, k_tscale=stk, v_tscale=stv,
    )
    out_ref = attend_packed_single_query(
        q, rk.astype(jnp.bfloat16), rv.astype(jnp.bfloat16), h, bias
    )
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_ref), rtol=0.06, atol=0.06)


def test_prefill_int4_carries_tscales_and_decode_runs():
    m4 = UnimodalTransformer(vocab_size=40, max_seq_len=12, cache_dtype="int4")
    x = jnp.ones((2, 64, 96, 1), jnp.float32)
    y_in = jnp.asarray([[1, 2]] * 2, jnp.int32)
    params = m4.init({"params": jax.random.PRNGKey(0)}, x, None, y_in)
    cross, mem_valid = m4.apply(params, x, None, method=UnimodalTransformer.decode_prefill)
    e = cross["layer0"]
    assert e["k"].dtype == jnp.int4 and e["v"].dtype == jnp.int4
    assert e["k_scale"].ndim == 2 and e["k_tscale"].ndim == 2
    assert e["k_tscale"].shape == (2, e["k"].shape[1])
    cache = m4.apply(params, 2, method=UnimodalTransformer.decode_init_cache)
    lg, _ = m4.apply(
        params, jnp.asarray([1, 1], jnp.int32), jnp.int32(0), cache, cross, mem_valid,
        method=UnimodalTransformer.decode_step,
    )
    assert lg.shape == (2, 40) and bool(jnp.isfinite(lg).all())
