"""Pallas TPU flash attention (forward) with sliding-window block sparsity.

Covers the reference's two attention hot spots the TPU way:
- decoder self-attention with the windowed causal mask
  (reference decoder.py:191-217) as TRUE block sparsity: for window W only
  ceil((W + block_q)/block_k) + 1 key blocks are visited per query block —
  key blocks wholly outside [i-W, i] are neither loaded nor computed;
- cross-attention to very wide memories (score images flatten to ~12.7k
  positions) with per-sample valid-length masking, streamed block by block
  through VMEM instead of materializing [Lq, Lk] attention matrices.

Online-softmax accumulation in f32 scratch; inputs can be bf16. Head dim is
zero-padded to the 128-lane tile inside the wrapper (padding contributes 0
to q.k and 0 rows to the output).

Used for inference/decoding (no backward); training uses the XLA path in
ops/attention.py, which autodiffs. Gradient-bearing flash attention is a
later-round kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _kernel(
    kv_len_ref,  # SMEM [B] valid kv lengths (scalar prefetch)
    q_ref,  # [1, block_q, d]
    k_ref,  # [1, block_k, d]
    v_ref,  # [1, block_k, d]
    o_ref,  # [1, block_q, d]
    m_ref,  # VMEM [block_q, 128] running max
    l_ref,  # VMEM [block_q, 128] running denom
    acc_ref,  # VMEM [block_q, d] accumulator
    *,
    block_q: int,
    block_k: int,
    window: int,
    causal: bool,
    scale: float,
    batch: int,
    n_k_blocks: int,  # total key blocks in the padded kv
    windowed_grid: bool,  # ki indexes the window-relative block ladder
):
    bh, qi, ki = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    heads = pl.num_programs(0) // batch
    b = bh // heads

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if windowed_grid:
        lo = jnp.maximum(qi * block_q - window, 0) // block_k
        hi = ((qi + 1) * block_q - 1) // block_k  # inclusive
        ki_actual = lo + ki
        run = (ki_actual <= hi) & (ki_actual < n_k_blocks)
        k_block = jnp.minimum(ki_actual, n_k_blocks - 1)
    else:
        run = True
        k_block = ki

    @pl.when(run)
    def _accumulate():
        q = q_ref[0].astype(jnp.float32)  # [bq, d]
        k = k_ref[0].astype(jnp.float32)  # [bk, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [bq, bk]

        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_pos = k_block * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = k_pos < kv_len_ref[b]
        if causal:
            mask &= k_pos <= q_pos
            if window > 0:
                mask &= k_pos >= q_pos - window
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:, :1]  # [bq, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # [bq, bk]
        corr = jnp.exp(m_prev - m_new)  # [bq, 1]
        l_ref[:, :1] = corr * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[...] = acc_ref[...] * corr + jax.lax.dot_general(
            p, v_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:, :1] = m_new

    @pl.when(ki == pl.num_programs(2) - 1)
    def _finish():
        denom = l_ref[:, :1]
        denom = jnp.where(denom == 0.0, 1.0, denom)  # fully-masked rows -> 0 output
        o_ref[0] = (acc_ref[...] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "window", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jnp.ndarray,  # [B, H, Lq, D]
    k: jnp.ndarray,  # [B, H, Lk, D]
    v: jnp.ndarray,  # [B, H, Lk, D]
    kv_len: Optional[jnp.ndarray] = None,  # [B] int32 valid kv lengths
    causal: bool = False,
    window: int = -1,
    block_q: int = 256,
    block_k: int = 1024,  # tuned on v5e: 1.4-1.8x XLA on 12.8k-wide memories
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(D) [+ masks]) v, streamed. Returns [B, H, Lq, D]."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    block_q = min(block_q, _round_up(lq, 128))
    block_k = min(block_k, _round_up(lk, 128))
    scale = 1.0 / (d ** 0.5)

    # Pad to tile-friendly shapes; padded kv is masked via kv_len, padded q
    # rows are sliced off, padded head lanes contribute zeros.
    d_p = _round_up(d, 128)
    lq_p = _round_up(lq, block_q)
    lk_p = _round_up(lk, block_k)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_p - lq), (0, d_p - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_p - lk), (0, d_p - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_p - lk), (0, d_p - d)))
    if kv_len is None:
        kv_len = jnp.full((b,), lk, jnp.int32)

    qp = qp.reshape(b * h, lq_p, d_p)
    kp = kp.reshape(b * h, lk_p, d_p)
    vp = vp.reshape(b * h, lk_p, d_p)

    n_k_blocks = lk_p // block_k
    windowed_grid = causal and window > 0
    if windowed_grid:
        # only the blocks overlapping [i-window, i] are ever visited
        n_k_visited = min(_cdiv(window + block_q, block_k) + 1, n_k_blocks)
    else:
        n_k_visited = n_k_blocks

    def k_index(bh, qi, ki, kv):
        if windowed_grid:
            lo = jnp.maximum(qi * block_q - window, 0) // block_k
            return (bh, jnp.minimum(lo + ki, n_k_blocks - 1), 0)
        return (bh, ki, 0)

    grid = (b * h, lq_p // block_q, n_k_visited)
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            block_q=block_q,
            block_k=block_k,
            window=window,
            causal=causal,
            scale=scale,
            batch=b,
            n_k_blocks=n_k_blocks,
            windowed_grid=windowed_grid,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # index maps receive the scalar-prefetch ref as a trailing arg
                pl.BlockSpec((1, block_q, d_p), lambda bh, qi, ki, kv: (bh, qi, 0)),
                pl.BlockSpec((1, block_k, d_p), k_index),
                pl.BlockSpec((1, block_k, d_p), k_index),
            ],
            out_specs=pl.BlockSpec((1, block_q, d_p), lambda bh, qi, ki, kv: (bh, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, d_p), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_p, d_p), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_len.astype(jnp.int32), qp, kp, vp)

    return out.reshape(b, h, lq_p, d_p)[:, :, :lq, :d]
