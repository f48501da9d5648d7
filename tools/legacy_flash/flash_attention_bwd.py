"""Training-grade Pallas flash attention: forward with saved LSE + custom
backward kernels (dq and dk/dv), both with sliding-window block sparsity.

Standard flash backward: with row statistics lse = m + log(sum exp) saved
from the forward, p = exp(s - lse) is recomputed blockwise, and
  ds = p * (do v^T - delta),   delta = rowsum(do * o)
  dq = scale * ds k,   dk = scale * ds^T q,   dv = p^T do.
No [Lq, Lk] tensor is ever materialized, so windowed decoder self-attention
trains in O(L * window) memory/compute (the reference trains O(L^2) masked
matrices, decoder.py:191-247).

Exposed as ``make_flash_attention(causal, window, ...)`` returning a
custom_vjp'd callable f(q, k, v, kv_len) on [B, H, L, D] tensors.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _window_blocks(window: int, block_q: int, block_k: int, n_k_blocks: int, causal: bool):
    """Number of key blocks each query block must visit (and vice versa)."""
    if not (causal and window > 0):
        return n_k_blocks
    return min(_cdiv(window + block_q, block_k) + 1, n_k_blocks)


def _mask(qi, k_block, block_q, block_k, kv_limit, causal, window):
    q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    k_pos = k_block * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    m = k_pos < kv_limit
    if causal:
        m &= k_pos <= q_pos
        if window > 0:
            m &= k_pos >= q_pos - window
    return m


# --------------------------------------------------------------------- fwd


def _fwd_kernel(kv_len_ref, q_ref, k_ref, v_ref, kv_mask_ref, o_ref, lse_ref, m_s, l_s, acc_s,
                *, block_q, block_k, window, causal, scale, batch, n_k_blocks, windowed):
    bh, qi, ki = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    b = bh // (pl.num_programs(0) // batch)

    @pl.when(ki == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    if windowed:
        lo = jnp.maximum(qi * block_q - window, 0) // block_k
        hi = ((qi + 1) * block_q - 1) // block_k
        ki_actual = lo + ki
        run = (ki_actual <= hi) & (ki_actual < n_k_blocks)
        k_block = jnp.minimum(ki_actual, n_k_blocks - 1)
    else:
        run = True
        k_block = ki

    @pl.when(run)
    def _acc():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
        mask = _mask(qi, k_block, block_q, block_k, kv_len_ref[b], causal, window)
        mask &= kv_mask_ref[0] > 0  # [1, bk] broadcasts over rows (Mosaic requires >=2D)
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_s[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_s[:, :1] = corr * l_s[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        acc_s[...] = acc_s[...] * corr + jax.lax.dot_general(
            p, v_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_s[:, :1] = m_new

    @pl.when(ki == pl.num_programs(2) - 1)
    def _fin():
        l = l_s[:, :1]
        denom = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_s[...] / denom).astype(o_ref.dtype)
        lse = m_s[:, :1] + jnp.log(denom)
        lse = jnp.where(l == 0.0, 0.0, lse)  # fully-masked rows: benign lse
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


# ---------------------------------------------------------------------- dq


def _dq_kernel(kv_len_ref, q_ref, k_ref, v_ref, kv_mask_ref, do_ref, lse_ref, delta_ref, dq_ref, acc_s,
               *, block_q, block_k, window, causal, scale, batch, n_k_blocks, windowed):
    bh, qi, ki = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    b = bh // (pl.num_programs(0) // batch)

    @pl.when(ki == 0)
    def _init():
        acc_s[...] = jnp.zeros_like(acc_s)

    if windowed:
        lo = jnp.maximum(qi * block_q - window, 0) // block_k
        hi = ((qi + 1) * block_q - 1) // block_k
        ki_actual = lo + ki
        run = (ki_actual <= hi) & (ki_actual < n_k_blocks)
        k_block = jnp.minimum(ki_actual, n_k_blocks - 1)
    else:
        run = True
        k_block = ki

    @pl.when(run)
    def _acc():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
        mask = _mask(qi, k_block, block_q, block_k, kv_len_ref[b], causal, window)
        mask &= kv_mask_ref[0] > 0  # [1, bk] broadcasts over rows (Mosaic requires >=2D)
        p = jnp.where(mask, jnp.exp(s - lse_ref[0][:, :1]), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0][:, :1]) * scale
        acc_s[...] += jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(ki == pl.num_programs(2) - 1)
    def _fin():
        dq_ref[0] = acc_s[...].astype(dq_ref.dtype)


# ------------------------------------------------------------------- dk/dv


def _dkv_kernel(kv_len_ref, q_ref, k_ref, v_ref, kv_mask_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                dk_s, dv_s,
                *, block_q, block_k, window, causal, scale, batch, n_q_blocks, windowed):
    bh, ki, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    b = bh // (pl.num_programs(0) // batch)

    @pl.when(qi == 0)
    def _init():
        dk_s[...] = jnp.zeros_like(dk_s)
        dv_s[...] = jnp.zeros_like(dv_s)

    if windowed:
        lo = (ki * block_k) // block_q  # first q block overlapping this key block
        hi = (ki * block_k + block_k - 1 + window) // block_q
        qi_actual = lo + qi
        run = (qi_actual <= hi) & (qi_actual < n_q_blocks)
        q_block = jnp.minimum(qi_actual, n_q_blocks - 1)
    else:
        run = True
        q_block = qi

    @pl.when(run)
    def _acc():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
        mask = _mask(q_block, ki, block_q, block_k, kv_len_ref[b], causal, window)
        mask &= kv_mask_ref[0] > 0  # [1, bk] broadcasts over rows (Mosaic requires >=2D)
        p = jnp.where(mask, jnp.exp(s - lse_ref[0][:, :1]), 0.0)
        dv_s[...] += jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0][:, :1]) * scale
        dk_s[...] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(qi == pl.num_programs(2) - 1)
    def _fin():
        dk_ref[0] = dk_s[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_s[...].astype(dv_ref.dtype)


# ------------------------------------------------------------------ driver


def make_flash_attention(
    causal: bool = False,
    window: int = -1,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
):
    """Build a differentiable flash attention f(q, k, v, kv_len, kv_valid) -> o.

    q: [B, H, Lq, D]; k, v: [B, H, Lk, D]; kv_len: [B] int32 prefix lengths
    (pass jnp.full((B,), Lk) for no length mask); kv_valid: [B, Lk] bool
    per-position key validity (pass jnp.ones((B, Lk), bool) for none) — this
    covers non-prefix masks like the concat mixer's fused image+audio
    memories. Static config is baked in so jit caches one program per
    configuration.
    """

    windowed = causal and window > 0

    def _prep(q, k, v, do=None):
        b, h, lq, d = q.shape
        lk = k.shape[2]
        bq = min(block_q, _round_up(lq, 128))
        bk = min(block_k, _round_up(lk, 128))
        d_p = _round_up(d, 128)
        lq_p = _round_up(lq, bq)
        lk_p = _round_up(lk, bk)
        pad3 = lambda t, L: jnp.pad(t, ((0, 0), (0, 0), (0, L - t.shape[2]), (0, d_p - d)))
        qp = pad3(q, lq_p).reshape(b * h, lq_p, d_p)
        kp = pad3(k, lk_p).reshape(b * h, lk_p, d_p)
        vp = pad3(v, lk_p).reshape(b * h, lk_p, d_p)
        dop = pad3(do, lq_p).reshape(b * h, lq_p, d_p) if do is not None else None
        return qp, kp, vp, dop, (b, h, lq, lk, d, bq, bk, d_p, lq_p, lk_p)

    def _prep_mask(kv_valid, b, lk, lk_p):
        # [B, 1, lk_p] so the (1, block_k) tile satisfies TPU tiling rules
        return jnp.pad(kv_valid.astype(jnp.int32), ((0, 0), (0, lk_p - lk)))[:, None, :]

    def _fwd_impl(q, k, v, kv_len, kv_valid):
        qp, kp, vp, _, (b, h, lq, lk, d, bq, bk, d_p, lq_p, lk_p) = _prep(q, k, v)
        maskp = _prep_mask(kv_valid, b, lk, lk_p)
        scale = 1.0 / (d ** 0.5)
        n_k_blocks = lk_p // bk
        nkv = _window_blocks(window, bq, bk, n_k_blocks, causal)

        def k_index(bh, qi, ki, kv):
            if windowed:
                lo = jnp.maximum(qi * bq - window, 0) // bk
                return (bh, jnp.minimum(lo + ki, n_k_blocks - 1), 0)
            return (bh, ki, 0)

        def m_index(bh, qi, ki, kv):
            kb = k_index(bh, qi, ki, kv)[1]
            return (bh // h, 0, kb)

        o, lse = pl.pallas_call(
            functools.partial(_fwd_kernel, block_q=bq, block_k=bk, window=window, causal=causal,
                              scale=scale, batch=b, n_k_blocks=n_k_blocks, windowed=windowed),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b * h, lq_p // bq, nkv),
                in_specs=[
                    pl.BlockSpec((1, bq, d_p), lambda bh, qi, ki, kv: (bh, qi, 0)),
                    pl.BlockSpec((1, bk, d_p), k_index),
                    pl.BlockSpec((1, bk, d_p), k_index),
                    pl.BlockSpec((1, 1, bk), m_index),
                ],
                out_specs=[
                    pl.BlockSpec((1, bq, d_p), lambda bh, qi, ki, kv: (bh, qi, 0)),
                    pl.BlockSpec((1, bq, 128), lambda bh, qi, ki, kv: (bh, qi, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((bq, 128), jnp.float32),
                    pltpu.VMEM((bq, 128), jnp.float32),
                    pltpu.VMEM((bq, d_p), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((b * h, lq_p, d_p), q.dtype),
                jax.ShapeDtypeStruct((b * h, lq_p, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(kv_len.astype(jnp.int32), qp, kp, vp, maskp)
        out = o.reshape(b, h, lq_p, d_p)[:, :, :lq, :d]
        return out, (lse[:, :, 0],)  # [BH, Lq_p]

    # o is saved as a residual (cheap: same size as q); delta = rowsum(do*o)
    # is computed on the XLA side in the backward rule.
    def _fwd_rule(q, k, v, kv_len, kv_valid):
        out, (lse,) = _fwd_impl(q, k, v, kv_len, kv_valid)
        return out, (q, k, v, kv_len, kv_valid, lse, out)

    def _bwd_rule(res, do):
        q, k, v, kv_len, kv_valid, lse, o = res
        b, h, lq, d = q.shape
        lk = k.shape[2]
        bq = min(block_q, _round_up(lq, 128))
        bk = min(block_k, _round_up(lk, 128))
        d_p = _round_up(d, 128)
        lq_p = _round_up(lq, bq)
        lk_p = _round_up(lk, bk)
        scale = 1.0 / (d ** 0.5)
        n_k_blocks = lk_p // bk
        n_q_blocks = lq_p // bq
        nkv = _window_blocks(window, bq, bk, n_k_blocks, causal)
        nqv = min(_cdiv(bk + window, bq) + 1, n_q_blocks) if windowed else n_q_blocks

        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)  # [B,H,Lq]
        delta = jnp.pad(delta.reshape(b * h, lq), ((0, 0), (0, lq_p - lq)))
        lse_p = jnp.pad(lse, ((0, 0), (0, lq_p - lse.shape[1])))
        # broadcast row stats to 128 lanes for tiling
        delta128 = jnp.broadcast_to(delta[..., None], (b * h, lq_p, 128))
        lse128 = jnp.broadcast_to(lse_p[..., None], (b * h, lq_p, 128))

        pad3 = lambda t, L: jnp.pad(t, ((0, 0), (0, 0), (0, L - t.shape[2]), (0, d_p - d)))
        qp = pad3(q, lq_p).reshape(b * h, lq_p, d_p)
        kp = pad3(k, lk_p).reshape(b * h, lk_p, d_p)
        vp = pad3(v, lk_p).reshape(b * h, lk_p, d_p)
        dop = pad3(do, lq_p).reshape(b * h, lq_p, d_p)
        maskp = _prep_mask(kv_valid, b, lk, lk_p)

        def k_index(bh, qi, ki, kv):
            if windowed:
                lo = jnp.maximum(qi * bq - window, 0) // bk
                return (bh, jnp.minimum(lo + ki, n_k_blocks - 1), 0)
            return (bh, ki, 0)

        def m_index_q(bh, qi, ki, kv):
            return (bh // h, 0, k_index(bh, qi, ki, kv)[1])

        q_at = lambda bh, qi, ki, kv: (bh, qi, 0)
        dq = pl.pallas_call(
            functools.partial(_dq_kernel, block_q=bq, block_k=bk, window=window, causal=causal,
                              scale=scale, batch=b, n_k_blocks=n_k_blocks, windowed=windowed),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b * h, n_q_blocks, nkv),
                in_specs=[
                    pl.BlockSpec((1, bq, d_p), q_at),
                    pl.BlockSpec((1, bk, d_p), k_index),
                    pl.BlockSpec((1, bk, d_p), k_index),
                    pl.BlockSpec((1, 1, bk), m_index_q),
                    pl.BlockSpec((1, bq, d_p), q_at),
                    pl.BlockSpec((1, bq, 128), q_at),
                    pl.BlockSpec((1, bq, 128), q_at),
                ],
                out_specs=pl.BlockSpec((1, bq, d_p), q_at),
                scratch_shapes=[pltpu.VMEM((bq, d_p), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((b * h, lq_p, d_p), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(kv_len.astype(jnp.int32), qp, kp, vp, maskp, dop, lse128, delta128)

        def q_index(bh, ki, qi, kv):
            if windowed:
                lo = (ki * bk) // bq
                return (bh, jnp.minimum(lo + qi, n_q_blocks - 1), 0)
            return (bh, qi, 0)

        k_at = lambda bh, ki, qi, kv: (bh, ki, 0)
        m_at = lambda bh, ki, qi, kv: (bh // h, 0, ki)
        dk, dv = pl.pallas_call(
            functools.partial(_dkv_kernel, block_q=bq, block_k=bk, window=window, causal=causal,
                              scale=scale, batch=b, n_q_blocks=n_q_blocks, windowed=windowed),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(b * h, n_k_blocks, nqv),
                in_specs=[
                    pl.BlockSpec((1, bq, d_p), q_index),
                    pl.BlockSpec((1, bk, d_p), k_at),
                    pl.BlockSpec((1, bk, d_p), k_at),
                    pl.BlockSpec((1, 1, bk), m_at),
                    pl.BlockSpec((1, bq, d_p), q_index),
                    pl.BlockSpec((1, bq, 128), q_index),
                    pl.BlockSpec((1, bq, 128), q_index),
                ],
                out_specs=[
                    pl.BlockSpec((1, bk, d_p), k_at),
                    pl.BlockSpec((1, bk, d_p), k_at),
                ],
                scratch_shapes=[
                    pltpu.VMEM((bk, d_p), jnp.float32),
                    pltpu.VMEM((bk, d_p), jnp.float32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((b * h, lk_p, d_p), k.dtype),
                jax.ShapeDtypeStruct((b * h, lk_p, d_p), v.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(kv_len.astype(jnp.int32), qp, kp, vp, maskp, dop, lse128, delta128)

        dq = dq.reshape(b, h, lq_p, d_p)[:, :, :lq, :d]
        dk = dk.reshape(b, h, lk_p, d_p)[:, :, :lk, :d]
        dv = dv.reshape(b, h, lk_p, d_p)[:, :, :lk, :d]
        dkv_len = np.zeros(kv_len.shape, dtype=jax.dtypes.float0)
        dkv_valid = np.zeros(kv_valid.shape, dtype=jax.dtypes.float0)
        return dq, dk, dv, dkv_len, dkv_valid

    @jax.custom_vjp
    def flash(q, k, v, kv_len, kv_valid):
        out, _ = _fwd_impl(q, k, v, kv_len, kv_valid)
        return out

    flash.defvjp(_fwd_rule, _bwd_rule)
    return flash


@functools.lru_cache(maxsize=16)
def flash_attention_cached(causal: bool = False, window: int = -1,
                           block_q: int = 256, block_k: int = 512,
                           interpret: bool = False):
    """Memoized make_flash_attention (one custom_vjp per static config, so
    repeated module traces reuse the same jaxpr cache)."""
    return make_flash_attention(causal=causal, window=window,
                                block_q=block_q, block_k=block_k, interpret=interpret)
