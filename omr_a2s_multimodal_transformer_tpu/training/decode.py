"""Autoregressive decoding on device.

The reference decodes greedily one sample at a time, re-running the full
decoder on the growing prefix with no KV cache (model.py:170-199 — the
dominant eval cost, O(L^2) full forwards). Here decoding is a single jitted
``lax.while_loop`` over a KV cache, batched over samples, with early exit
when every row has emitted <eos>. Variants:

- ``greedy``: tokens + the top-1 raw-logit score per step (the reference's
  Smith-Waterman fusion consumes raw-logit top-1 scores, model.py:226-262).
- ``weighted``: two-model lockstep fusion, next-token distribution
  alpha*softmax(img) + (1-alpha)*softmax(audio)
  (reference weighted_multimodal/test.py:21-70).
- ``beam``: batched beam search (TPU extra; the reference has none).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def _loop(step_logits: Callable, batch: int, max_len: int, sos_id: int, eos_id: int, carry_init: Dict[str, Any]):
    """Shared greedy loop. ``step_logits(tok, pos, carry) -> (logits, carry)``."""

    def cond(state):
        pos, _, done, _, _, _ = state
        return (pos < max_len) & ~jnp.all(done)

    def body(state):
        pos, tok, done, carry, out_tokens, out_scores = state
        logits, carry = step_logits(tok, pos, carry)
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        score = jnp.max(logits, axis=-1)
        out_tokens = jax.lax.dynamic_update_slice_in_dim(out_tokens, next_tok[:, None], pos, axis=1)
        out_scores = jax.lax.dynamic_update_slice_in_dim(out_scores, score[:, None].astype(jnp.float32), pos, axis=1)
        done = done | (next_tok == eos_id)
        return pos + 1, next_tok, done, carry, out_tokens, out_scores

    state = (
        jnp.int32(0),
        jnp.full((batch,), sos_id, jnp.int32),
        jnp.zeros((batch,), bool),
        carry_init,
        jnp.zeros((batch, max_len), jnp.int32),
        jnp.zeros((batch, max_len), jnp.float32),
    )
    _, _, _, _, out_tokens, out_scores = jax.lax.while_loop(cond, body, state)
    return out_tokens, out_scores


def greedy_decode_fn(model, max_len: int, sos_id: int, eos_id: int, multimodal: bool = False) -> Callable:
    """Build a jittable greedy decoder for a Unimodal/Multimodal model.

    Unimodal signature: f(params, x, hw) -> (tokens [B, max_len], scores).
    Multimodal:         f(params, xi, xi_hw, xa, xa_hw) -> (tokens, scores).
    hw arguments may be None (no memory padding -> no mask, like the
    reference's batch-1 eval); pass them for batched padded eval.
    """

    if multimodal:
        def decode(params, xi, xi_hw, xa, xa_hw):
            b = xi.shape[0]
            cross, mem_valid = model.apply(
                params, xi, xa, xi_hw, xa_hw, method=type(model).decode_prefill
            )
            cache = model.apply(params, b, method=type(model).decode_init_cache)

            def step_logits(tok, pos, carry):
                logits, cache = model.apply(
                    params, tok, pos, carry, cross, mem_valid, method=type(model).decode_step
                )
                return logits, cache

            return _loop(step_logits, b, max_len, sos_id, eos_id, cache)

        return decode

    def decode(params, x, hw):
        b = x.shape[0]
        cross, mem_valid = model.apply(params, x, hw, method=type(model).decode_prefill)
        cache = model.apply(params, b, method=type(model).decode_init_cache)

        def step_logits(tok, pos, carry):
            logits, cache = model.apply(
                params, tok, pos, carry, cross, mem_valid, method=type(model).decode_step
            )
            return logits, cache

        return _loop(step_logits, b, max_len, sos_id, eos_id, cache)

    return decode


def weighted_decode_fn(img_model, audio_model, max_len: int, sos_id: int, eos_id: int) -> Callable:
    """Two-unimodal-model weighted late fusion:
    next-token dist = alpha*softmax(img) + (1-alpha)*softmax(audio)."""

    def decode(img_params, audio_params, xi, xi_hw, xa, xa_hw, alpha):
        b = xi.shape[0]
        cross_i, valid_i = img_model.apply(img_params, xi, xi_hw, method=type(img_model).decode_prefill)
        cross_a, valid_a = audio_model.apply(audio_params, xa, xa_hw, method=type(audio_model).decode_prefill)
        cache_i = img_model.apply(img_params, b, method=type(img_model).decode_init_cache)
        cache_a = audio_model.apply(audio_params, b, method=type(audio_model).decode_init_cache)

        def step_logits(tok, pos, carry):
            ci, ca = carry["i"], carry["a"]
            li, ci = img_model.apply(img_params, tok, pos, ci, cross_i, valid_i, method=type(img_model).decode_step)
            la, ca = audio_model.apply(audio_params, tok, pos, ca, cross_a, valid_a, method=type(audio_model).decode_step)
            mixed = alpha * jax.nn.softmax(li, axis=-1) + (1.0 - alpha) * jax.nn.softmax(la, axis=-1)
            return mixed, {"i": ci, "a": ca}

        return _loop(step_logits, b, max_len, sos_id, eos_id, {"i": cache_i, "a": cache_a})

    return decode


def cut_at_eos(tokens, scores, eos_id: int) -> Tuple[list, list]:
    """Host post-processing: [B, L] arrays -> per-sample python lists of ids
    and scores, cut right AFTER the first <eos> (the reference includes the
    eos token in its predicted sequence)."""
    import numpy as np

    tokens = np.asarray(tokens)
    scores = np.asarray(scores)
    out_t, out_s = [], []
    for row_t, row_s in zip(tokens, scores):
        hits = np.nonzero(row_t == eos_id)[0]
        end = int(hits[0]) + 1 if len(hits) else len(row_t)
        out_t.append(row_t[:end].tolist())
        out_s.append(row_s[:end].tolist())
    return out_t, out_s


# ----------------------------------------------------------------- beam search


def beam_decode_fn(model, max_len: int, sos_id: int, eos_id: int, beam_size: int = 4,
                   length_penalty: float = 0.0, multimodal: bool = False) -> Callable:
    """Batched beam search over the KV-cached decoder.

    Unimodal:   f(params, x, hw) -> (tokens [B, max_len], scores [B]).
    Multimodal: f(params, xi, xi_hw, xa, xa_hw) -> same.
    Finished beams are frozen (forced eos continuation with zero added
    logprob). Length penalty: score / ((5+len)/6)^lp (GNMT).
    """

    def decode(params, *inputs):
        if multimodal:
            xi, xi_hw, xa, xa_hw = inputs
            b = xi.shape[0]
            cross, mem_valid = model.apply(
                params, xi, xa, xi_hw, xa_hw, method=type(model).decode_prefill
            )
        else:
            x, hw = inputs
            b = x.shape[0]
            cross, mem_valid = model.apply(params, x, hw, method=type(model).decode_prefill)
        k = beam_size

        def expand(t):  # [B, ...] -> [B*k, ...] tile along new beam dim
            return jnp.repeat(t, k, axis=0)

        cross_k = jax.tree.map(expand, cross)
        valid_k = None if mem_valid is None else expand(mem_valid)
        cache = model.apply(params, b * k, method=type(model).decode_init_cache)

        neg_inf = -1e9
        # beam 0 active, others dead at start so first expansion is unique
        logp = jnp.tile(jnp.asarray([0.0] + [neg_inf] * (k - 1), jnp.float32)[None], (b, 1))
        tokens = jnp.zeros((b, k, max_len), jnp.int32)
        done = jnp.zeros((b, k), bool)
        tok = jnp.full((b * k,), sos_id, jnp.int32)

        def cond(state):
            pos, _, _, done, _, _ = state
            return (pos < max_len) & ~jnp.all(done)

        def body(state):
            pos, tok, logp, done, tokens, cache = state
            logits, cache = model.apply(
                params, tok, pos, cache, cross_k, valid_k, method=type(model).decode_step
            )
            v = logits.shape[-1]
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1).reshape(b, k, v)
            # Finished beams: only eos continuation, no score change.
            frozen = jnp.full((k, v), neg_inf).at[:, eos_id].set(0.0)
            lp = jnp.where(done[..., None], frozen[None], lp)
            cand = logp[..., None] + lp  # [B, k, V]
            flat = cand.reshape(b, k * v)
            top_logp, top_idx = jax.lax.top_k(flat, k)  # [B, k]
            src_beam = top_idx // v
            next_tok = (top_idx % v).astype(jnp.int32)
            # Reorder histories and caches by source beam.
            batch_idx = jnp.arange(b)[:, None]
            tokens = tokens[batch_idx, src_beam]
            tokens = jax.lax.dynamic_update_slice_in_dim(tokens, next_tok[..., None], pos, axis=2)
            done = done[batch_idx, src_beam] | (next_tok == eos_id)
            flat_src = (batch_idx * k + src_beam).reshape(-1)
            cache = jax.tree.map(lambda c: c[flat_src], cache)
            return pos + 1, next_tok.reshape(-1), top_logp, done, tokens, cache

        state = (jnp.int32(0), tok, logp, done, tokens, cache)
        pos, _, logp, done, tokens, _ = jax.lax.while_loop(cond, body, state)

        if length_penalty > 0.0:
            lens = jnp.sum(jnp.cumsum(tokens == eos_id, axis=-1) == 0, axis=-1) + 1
            logp = logp / jnp.power((5.0 + lens.astype(jnp.float32)) / 6.0, length_penalty)
        best = jnp.argmax(logp, axis=1)
        return tokens[jnp.arange(b), best], logp[jnp.arange(b), best]

    return decode
