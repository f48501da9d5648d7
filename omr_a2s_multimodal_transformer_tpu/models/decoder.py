"""Autoregressive transformer decoder (flax.linen) with KV-cached decoding.

Architecture parity with the reference decoder
(``/root/reference/src/transformer/decoder.py:35-148``): token embedding
(256, pad row frozen at zero), fixed 1D sinusoidal PE + dropout, 8 post-LN
torch-style decoder layers (4 heads, d_model 256, ff 256, ReLU,
dropout 0.1), and a pointwise classification layer.

TPU-first differences:
- Greedy/beam decoding uses an incremental step with per-layer KV caches
  (``init_cache``/``prefill``/``step``) inside ``lax.while_loop`` — the
  reference re-runs the full decoder on the growing prefix every step
  (O(L^2) full forwards, model.py:182-193).
- Masks are closed-form (ops/masks.py). The windowed causal mask
  (``attn_window``) is applied identically in full and cached modes.
- Key-padding semantics default to proper -inf masking;
  ``torch_float_parity=True`` reproduces the reference's accidental
  float-mask (+1.0 additive) behavior for bit-parity experiments.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from omr_a2s_multimodal_transformer_tpu.models.positional import positional_encoding_1d
from omr_a2s_multimodal_transformer_tpu.ops import masks as M
from omr_a2s_multimodal_transformer_tpu.ops.attention import (
    attend,
    attend_packed_single_query,
    merge_heads,
    split_heads,
)
from omr_a2s_multimodal_transformer_tpu.ops.banded_attention import banded_causal_attention


class MultiHeadProj(nn.Module):
    """Q/K/V/out projection bundle (bias=True, torch MHA layout)."""

    d_model: int
    n_heads: int

    def setup(self):
        self.q_proj = nn.Dense(self.d_model, name="q_proj")
        self.k_proj = nn.Dense(self.d_model, name="k_proj")
        self.v_proj = nn.Dense(self.d_model, name="v_proj")
        self.out_proj = nn.Dense(self.d_model, name="out_proj")

    def qkv(self, q_in, kv_in):
        q = split_heads(self.q_proj(q_in), self.n_heads)
        k = split_heads(self.k_proj(kv_in), self.n_heads)
        v = split_heads(self.v_proj(kv_in), self.n_heads)
        return q, k, v

    def __call__(self, q_in, kv_in, mask, dropout_rate=0.0, dropout_rng=None):
        q, k, v = self.qkv(q_in, kv_in)
        out = attend(q, k, v, mask, dropout_rate, dropout_rng)
        return self.out_proj(merge_heads(out))


class DecoderLayer(nn.Module):
    """Post-LN decoder layer: self-attn -> cross-attn -> FF (torch
    TransformerDecoderLayer with norm_first=False, ReLU)."""

    d_model: int = 256
    n_heads: int = 4
    ff_dim: int = 256
    dropout: float = 0.1
    # Flash cross-attention for the full-sequence (training) forward: avoids
    # materializing [L, S] logits against very wide memories (the max
    # GRANDSTAFF config has 14.3k-token fused memories -> ~580MB f32 per
    # layer). Head-packed kernel (ops/flash_packed.py): q/k/v stay [B, L,
    # H*Dh] with zero tile padding, and attention-weight dropout matches the
    # reference's torch-MHA semantics (dropout after softmax,
    # reference decoder.py:75-102).
    use_flash_cross: bool = False
    # Device mesh for the flash path (explicit threading — VERDICT r2 #4):
    # shard_map's batch/head partitioning must not depend on sniffing jax
    # internals for an ambient mesh. None -> single-device (or the ambient
    # mesh as a fallback inside flash_attention_packed_auto).
    mesh: Any = None

    def setup(self):
        self.self_attn = MultiHeadProj(self.d_model, self.n_heads, name="self_attn")
        self.cross_attn = MultiHeadProj(self.d_model, self.n_heads, name="cross_attn")
        self.linear1 = nn.Dense(self.ff_dim, name="linear1")
        self.linear2 = nn.Dense(self.d_model, name="linear2")
        self.norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        self.norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")
        self.norm3 = nn.LayerNorm(epsilon=1e-5, name="norm3")

    def _drop(self, x, deterministic):
        if deterministic or self.dropout == 0.0:
            return x
        keep = jax.random.bernoulli(self.make_rng("dropout"), 1.0 - self.dropout, x.shape)
        return jnp.where(keep, x / (1.0 - self.dropout), 0.0)

    def _attn_rng(self, deterministic):
        return None if (deterministic or self.dropout == 0.0) else self.make_rng("dropout")

    def __call__(
        self,
        x,
        memory,
        self_mask,
        mem_mask,
        deterministic: bool = True,
        banded_window: int = 0,  # >0: compute self-attn as an exact W-band
        self_key_bias=None,  # [B, L] additive key bias for the banded path
        memory_valid=None,  # [B, S] bool (flash cross-attention path)
    ):
        if banded_window > 0:
            q, k, v = self.self_attn.qkv(x, x)
            h = banded_causal_attention(
                q, k, v, banded_window, key_bias=self_key_bias,
                dropout_rate=0.0 if deterministic else self.dropout,
                dropout_rng=self._attn_rng(deterministic),
            )
            h = self.self_attn.out_proj(merge_heads(h))
        else:
            h = self.self_attn(x, x, self_mask, self.dropout, self._attn_rng(deterministic))
        x = self.norm1(x + self._drop(h, deterministic))
        if self.use_flash_cross:
            from omr_a2s_multimodal_transformer_tpu.ops import flash_packed

            # Head-packed: the projections already emit [B, L, H*Dh]; the
            # kernel block-diagonalizes internally, so no split/transpose.
            # bf16 at the kernel boundary: LayerNorm upcasts activations to
            # f32, which would double the kernel's HBM traffic and quarter
            # MXU throughput (softmax stats stay f32 inside the kernel).
            qp = self.cross_attn.q_proj(x).astype(jnp.bfloat16)
            kp = self.cross_attn.k_proj(memory).astype(jnp.bfloat16)
            vp = self.cross_attn.v_proj(memory).astype(jnp.bfloat16)
            b, s = memory.shape[0], memory.shape[1]
            kv_len = jnp.full((b,), s, jnp.int32)
            kv_valid = memory_valid if memory_valid is not None else jnp.ones((b, s), bool)
            rate = 0.0 if deterministic else self.dropout
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
                )
            else:
                seed = jnp.int32(0)
            # bq=128/bk=2048 won the v5e block sweep at flagship shapes
            # (tools/sweep_flash_blocks.py: 8.2 ms fwd+bwd vs 8.7 at
            # 256/1024, 10.0 at 128/512; bk>=3072 regresses / fails the
            # scoped-VMEM budget). _auto shard_maps over an ambient mesh
            # (dp batch + tp head sharding); interpret mode makes the path
            # runnable on CPU (tests, multichip dryrun).
            flash = flash_packed.flash_attention_packed_auto(
                n_heads=self.n_heads, dh=self.d_model // self.n_heads,
                batch=qp.shape[0], dropout_rate=rate, block_q=128, block_k=2048,
                interpret=jax.default_backend() == "cpu",
                mesh=self.mesh,
            )
            h = self.cross_attn.out_proj(flash(qp, kp, vp, kv_len, kv_valid, seed))
        else:
            h = self.cross_attn(x, memory, mem_mask, self.dropout, self._attn_rng(deterministic))
        x = self.norm2(x + self._drop(h, deterministic))
        h = self.linear2(self._drop(nn.relu(self.linear1(x)), deterministic))
        x = self.norm3(x + self._drop(h, deterministic))
        return x

    def cross_kv(self, memory):
        """Precompute cross-attention K/V once per sequence (decode path).

        Returned HEAD-PACKED [B, S, D]: the tiny trailing dims of a
        [B, S, H, Dh] layout get tile-padded by XLA (up to 8x HBM bytes),
        and every decode step re-reads the full array — see
        ops/attention.py:attend_packed_single_query.
        """
        return self.cross_attn.k_proj(memory), self.cross_attn.v_proj(memory)

    def step(self, x, pos, cache_k, cache_v, cross_k, cross_v, self_mask, mem_bias,
             cross_k_scale=None, cross_v_scale=None,
             cross_k_tscale=None, cross_v_tscale=None):
        """One decode step. x: [B, 1, D]; self caches head-packed
        [B, cache_len, D]; cross_k/cross_v head-packed [B, S, D]
        (int8 when cross_*_scale [B, D] are given; int4 additionally
        carries rank-1 per-token scales cross_*_tscale [B, S]).

        self_mask: [B?, cache_len] additive key bias over cached positions.
        mem_bias: [B, S] additive key bias (or None).
        Returns (y [B,1,D], new_cache_k, new_cache_v).
        """
        q = self.self_attn.q_proj(x)[:, 0]  # [B, D]
        k_new = self.self_attn.k_proj(x)  # [B, 1, D]
        v_new = self.self_attn.v_proj(x)
        cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, k_new.astype(cache_k.dtype), pos, axis=1)
        cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, v_new.astype(cache_v.dtype), pos, axis=1)
        h = attend_packed_single_query(q, cache_k, cache_v, self.n_heads, self_mask)
        h = self.self_attn.out_proj(h[:, None, :].astype(x.dtype))
        x = self.norm1(x + h)
        q2 = self.cross_attn.q_proj(x)  # [B, 1, D]
        h = attend_packed_single_query(
            q2[:, 0], cross_k, cross_v, self.n_heads, mem_bias,
            k_scale=cross_k_scale, v_scale=cross_v_scale,
            k_tscale=cross_k_tscale, v_tscale=cross_v_tscale,
        )
        h = self.cross_attn.out_proj(h[:, None, :].astype(x.dtype))
        x = self.norm2(x + h)
        x = self.norm3(x + self.linear2(nn.relu(self.linear1(x))))
        return x, cache_k, cache_v


class KernDecoder(nn.Module):
    """Embedding + PE + N decoder layers + classifier."""

    vocab_size: int
    max_seq_len: int
    d_model: int = 256
    n_heads: int = 4
    ff_dim: int = 256
    n_layers: int = 8
    dropout: float = 0.1
    attn_window: int = -1  # <=0: plain causal
    # Storage dtype for decode-time KV caches + cross K/V. Every decode step
    # re-reads these from HBM (the decode bandwidth floor); bfloat16 halves
    # that traffic, "int8" halves it again and "int4" once more (per-channel
    # quantized cross K/V; self ring cache stays bf16). float32 keeps
    # bit-exact full-forward equivalence; int4 trades a little logit
    # accuracy for the lowest decode bandwidth floor.
    cache_dtype: str = "float32"
    # Flash cross-attention in the full-sequence forward (training): avoids
    # [L, S] logits against wide memories. Implies -inf pad semantics (not
    # compatible with torch_float_parity). Attention-weight dropout runs
    # inside the kernel (torch-MHA semantics).
    use_flash_cross: bool = False
    # Device mesh for the flash path (explicit threading; see DecoderLayer).
    mesh: Any = None
    # Rematerialize each decoder layer in the backward pass. Matters for the
    # NO-flash training path: plain XLA cross-attention materializes an f32
    # [B, H, L, S] score tensor per layer (1.94 GB/layer at b8/L1268/S12.7k
    # — all n_layers live at once for the backward without remat; measured
    # 22.6 GB OOM on the 16 GB v5e). Flash never materializes scores, so it
    # doesn't need this.
    remat: bool = False

    def setup(self):
        self.embedding = self.param(
            "embedding", nn.initializers.normal(1.0), (self.vocab_size, self.d_model)
        )
        # static_argnums counts self as 0 -> 5 == deterministic, 6 == banded_window
        layer_cls = (
            nn.remat(DecoderLayer, static_argnums=(5, 6)) if self.remat else DecoderLayer
        )
        self.layers = [
            layer_cls(self.d_model, self.n_heads, self.ff_dim, self.dropout,
                      use_flash_cross=self.use_flash_cross, mesh=self.mesh,
                      name=f"layer{i}")
            for i in range(self.n_layers)
        ]
        self.out_layer = nn.Dense(self.vocab_size, name="out_layer")

    def _embed(self, ids: jnp.ndarray) -> jnp.ndarray:
        # Pad row pinned to zero (torch padding_idx semantics: zero vector,
        # zero gradient — the overwrite makes autodiff drop row-0 grads).
        table = self.embedding.at[0].set(0.0)
        return jnp.take(table, ids, axis=0)

    def _pe(self) -> jnp.ndarray:
        return jnp.asarray(positional_encoding_1d(self.max_seq_len, self.d_model))

    def _drop(self, x, deterministic):
        if deterministic or self.dropout == 0.0:
            return x
        keep = jax.random.bernoulli(self.make_rng("dropout"), 1.0 - self.dropout, x.shape)
        return jnp.where(keep, x / (1.0 - self.dropout), 0.0)

    def __call__(
        self,
        tgt_ids: jnp.ndarray,  # [B, L]
        memory: jnp.ndarray,  # [B, S, D]
        memory_valid: Optional[jnp.ndarray] = None,  # [B, S] bool
        deterministic: bool = True,
        torch_float_parity: bool = False,
    ) -> jnp.ndarray:
        """Full-sequence decode (training). Returns logits [B, L, V].

        Mask plumbing mirrors the reference (decoder.py:104-148): the target
        pad mask is applied only when a memory mask is present (both are
        disabled together at inference).
        """
        b, l = tgt_ids.shape
        x = self._drop(self._embed(tgt_ids) + self._pe()[None, :l], deterministic)

        # Banded path: for windowed attention over long sequences, compute
        # the W-band directly (O(L*2C) instead of O(L^2), exact — see
        # ops/banded_attention.py). Below the threshold the full masked
        # matrix is cheaper.
        chunk = max(128, -(-self.attn_window // 128) * 128) if self.attn_window > 0 else 0
        banded = self.attn_window if (self.attn_window > 0 and l > 2 * chunk) else 0

        self_mask = None
        self_key_bias = None
        if not banded:
            self_mask = M.windowed_causal_mask(l, self.attn_window)[None, None]
        mem_mask = None
        if memory_valid is not None:
            tgt_valid = tgt_ids != 0
            pad_bias = 1.0 if torch_float_parity else M.NEG_INF
            key_bias = jnp.where(tgt_valid, 0.0, pad_bias)
            if banded:
                self_key_bias = key_bias
            else:
                self_mask = self_mask + key_bias[:, None, None, :]
            mem_mask = M.key_padding_additive(memory_valid, torch_float_parity=torch_float_parity)

        if self.use_flash_cross:
            assert not torch_float_parity, "flash cross-attention implies -inf pad masking"
        for layer in self.layers:
            # positional: nn.remat static_argnums (5, 6) address these slots
            x = layer(x, memory, self_mask, mem_mask, deterministic,
                      banded, self_key_bias,
                      memory_valid if self.use_flash_cross else None)
        return self.out_layer(x)

    # ---------------------------------------------------------------- decode
    @property
    def cache_len(self) -> int:
        """Self-attention cache length. With a window only the last W+1
        positions are ever attended, so the cache is a ring buffer of that
        size — each decode step then reads O(window) instead of O(max_seq_len)
        from HBM (the decode bandwidth floor)."""
        if self.attn_window > 0:
            return min(self.max_seq_len, self.attn_window + 1)
        return self.max_seq_len

    def init_cache(self, batch: int, dtype=None) -> Dict[str, Any]:
        # Head-packed [B, cache_len, D] (same layout rationale as cross_kv).
        # int8/int4 cache_dtype applies to the (large, write-once) cross K/V
        # only; the self ring cache is small and appended every step, so it
        # stays bfloat16 (requantizing a running ring would drift).
        dtype = dtype or (
            jnp.bfloat16 if self.cache_dtype in ("int8", "int4") else jnp.dtype(self.cache_dtype)
        )
        shape = (batch, self.cache_len, self.d_model)
        return {
            f"layer{i}": {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
            for i in range(self.n_layers)
        }

    def prefill(self, memory: jnp.ndarray) -> Dict[str, Any]:
        """Precompute per-layer cross-attention K/V from the memory.

        cache_dtype="int8": per-(batch, channel) symmetric quantization;
        entries carry {"k","v","k_scale","v_scale"} and every decode step
        reads 1/2 the bytes of bf16 (the flagship decode bandwidth floor).
        SER-lossless at corpus scale (reports/cache_dtype_ser.json).

        cache_dtype="int4": rank-1 two-sided symmetric quantization —
        q = round(t / (s_c[b,d] * s_t[b,s])) with a per-channel scale
        (channel max over positions) and a residual per-token scale (token
        max over channels after channel equilibration). 7 levels per sign
        cannot spend their range on one outlier position: channel-only
        scales let a single position (notably PADDED memory columns, which
        prefill cannot mask out) inflate a channel's scale for every other
        position — measured +6.2 SER at corpus scale. Per-token scales give
        every position full use of the s4 range; both folds stay O(S+D)
        (see ops/attention.py:attend_packed_single_query). Packs two values
        per byte natively on TPU (XLA s4 tiling).
        """
        if self.cache_dtype in ("int8", "int4"):
            qmax = 127.0 if self.cache_dtype == "int8" else 7.0
            store = jnp.int8 if self.cache_dtype == "int8" else jnp.int4
            out = {}
            for i, layer in enumerate(self.layers):
                entry = {}
                for name, t in zip(("k", "v"), layer.cross_kv(memory)):
                    t = t.astype(jnp.float32)
                    if self.cache_dtype == "int4":
                        s_c = jnp.maximum(jnp.max(jnp.abs(t), axis=1), 1e-8)  # [B, D]
                        t = t / s_c[:, None, :]
                        s_t = jnp.maximum(jnp.max(jnp.abs(t), axis=2), 1e-8) / qmax  # [B, S]
                        entry[name] = (
                            jnp.clip(jnp.round(t / s_t[:, :, None]), -qmax, qmax).astype(store)
                        )
                        entry[f"{name}_scale"] = s_c
                        entry[f"{name}_tscale"] = s_t
                    else:
                        s = jnp.maximum(jnp.max(jnp.abs(t), axis=1), 1e-8) / qmax  # [B, D]
                        entry[name] = (
                            jnp.clip(jnp.round(t / s[:, None, :]), -qmax, qmax).astype(store)
                        )
                        entry[f"{name}_scale"] = s
                out[f"layer{i}"] = entry
            return out
        dtype = jnp.dtype(self.cache_dtype)
        return {
            f"layer{i}": {
                k: v.astype(dtype) for k, v in zip(("k", "v"), layer.cross_kv(memory))
            }
            for i, layer in enumerate(self.layers)
        }

    def step(
        self,
        token_ids: jnp.ndarray,  # [B]
        pos,  # scalar int32 (current position, 0-based)
        cache: Dict[str, Any],
        cross: Dict[str, Any],
        memory_valid: Optional[jnp.ndarray] = None,  # [B, S] bool
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        """One greedy-decode step. Returns (logits [B, V], updated cache)."""
        b = token_ids.shape[0]
        x = self._embed(token_ids)[:, None, :] + jax.lax.dynamic_slice_in_dim(self._pe(), pos, 1, axis=0)[None]

        c_len = self.cache_len
        if self.attn_window > 0 and c_len < self.max_seq_len:
            # Ring buffer: slot s holds global position p_s = pos - ((pos-s) mod C),
            # the most recent position congruent to s. Unwritten slots resolve
            # to negative p_s and are masked.
            write_at = jnp.mod(pos, c_len)
            s = jnp.arange(c_len)[None, :]
            p_s = pos - jnp.mod(pos - s, c_len)
            allowed = (p_s >= 0) & (p_s >= pos - self.attn_window)
        else:
            write_at = pos
            j = jnp.arange(c_len)[None, :]
            allowed = j <= pos
            if self.attn_window > 0:
                allowed &= j >= pos - self.attn_window
        self_mask = jnp.where(allowed, 0.0, M.NEG_INF)  # [1, cache_len] key bias

        mem_bias = None
        if memory_valid is not None:
            mem_bias = jnp.where(memory_valid, 0.0, M.NEG_INF)  # [B, S]

        new_cache = {}
        for i, layer in enumerate(self.layers):
            c = cache[f"layer{i}"]
            cr = cross[f"layer{i}"]
            x, ck, cv = layer.step(
                x, write_at, c["k"], c["v"], cr["k"], cr["v"], self_mask, mem_bias,
                cross_k_scale=cr.get("k_scale"), cross_v_scale=cr.get("v_scale"),
                cross_k_tscale=cr.get("k_tscale"), cross_v_tscale=cr.get("v_tscale"),
            )
            new_cache[f"layer{i}"] = {"k": ck, "v": cv}
        return self.out_layer(x)[:, 0, :], new_cache
