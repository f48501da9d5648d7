"""Multimodal (image + audio) transformer with early-fusion mixers.

Parity target: reference ``MultimodalTransformer`` (model.py:358-726) — two
independent conv-stem encoders with their own 2D PEs, one shared decoder,
and a modality mixer chosen at construction:

- ``concat``     sequence concat + concatenated validity mask
- ``attn_img``   audio queries attend to image keys/values (output len = La)
- ``attn_audio`` image queries attend to audio keys/values (output len = Li)
- ``attn_both``  both directions then concat. NOTE: preserves the
  reference's exact dataflow (model.py:713-726): the image-query pass
  attends to the *already attended* audio, not the raw audio; all passes
  share one CrossAttention module.

The mixer cross-attention masks only the (pad query x pad key) corner —
exactly the reference's ``create_attention_mask`` (model.py:343-351).
Training-time modality dropout ("teacher_forcing_modality") is a host-side
draw dispatching to one of three static programs (see training/loop.py);
the forward here takes the chosen ``modality`` as a static argument.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from omr_a2s_multimodal_transformer_tpu.models.decoder import KernDecoder, MultiHeadProj
from omr_a2s_multimodal_transformer_tpu.models.encoder import ConvStemEncoder
from omr_a2s_multimodal_transformer_tpu.models.transformer import (
    add_pos2d_and_flatten,
    memory_valid_from_hw,
)
from omr_a2s_multimodal_transformer_tpu.ops import masks as M

MIXER_TYPES = ("concat", "attn_img", "attn_audio", "attn_both")


class CrossAttention(nn.Module):
    """4-head MHA wrapper with the reference's corner pad mask
    (model.py:268-355)."""

    d_model: int = 256
    n_heads: int = 4
    dropout: float = 0.1

    def setup(self):
        self.mha = MultiHeadProj(self.d_model, self.n_heads, name="mha")

    def __call__(
        self,
        query: jnp.ndarray,  # [B, Lq, D]
        key_value: jnp.ndarray,  # [B, Lk, D]
        q_valid: Optional[jnp.ndarray] = None,  # [B, Lq] bool
        k_valid: Optional[jnp.ndarray] = None,  # [B, Lk] bool
        deterministic: bool = True,
    ) -> jnp.ndarray:
        mask = None
        if q_valid is not None and k_valid is not None:
            mask = M.corner_attn_mask(q_valid, k_valid)
        rng = None if (deterministic or self.dropout == 0.0) else self.make_rng("dropout")
        return self.mha(query, key_value, mask, self.dropout, rng)


class MultimodalTransformer(nn.Module):
    vocab_size: int
    max_seq_len: int
    mixer_type: str = "concat"
    # Gated-residual attention mixers (framework addition, OFF by default
    # for reference parity): memory = query + tanh(gate) * CrossAttn(query,
    # kv) with gate initialized to ZERO, instead of the reference's raw MHA
    # output (model.py:706-726). The reference's mixers REPLACE the memory
    # with a fresh random projection at init, which must relearn everything
    # before the decoder sees signal — measured as a no-latch basin (flat
    # loss ~3.4) at every scale tried, 60-200 epochs
    # (reports/grid_r04_full.json, grid_r04_warm.json). An UNgated residual
    # (query + raw fresh-init attention) was also measured in the same
    # basin (flat 3.55, reports/grid_resid_small.json leg attn_img_resid):
    # the fresh attention output perturbs the working query stream enough
    # that the decoder ignores memory anyway. The zero-init tanh gate
    # (Flamingo's xattn gating / ReZero) makes the mixed memory EXACTLY the
    # query modality's memory at init — the model first becomes a working
    # unimodal system, then opens the gate only where the other modality's
    # evidence reduces loss.
    mixer_residual: bool = False
    attn_window: int = -1
    encoder_dropout: float = 0.5
    decoder_dropout: float = 0.1
    pos_dropout: float = 0.1
    masked_norm: bool = False
    remat: bool = False
    # Sequence parallelism: PartitionSpec entries for the flattened memory
    # [batch, seq, feature], e.g. ('data', 'model', None) shards the 12.7k-token
    # image memories over the model axis (requires an active Mesh context).
    memory_partition: object = None
    prefix_memory_mask: bool = False
    torch_float_parity: bool = False
    cache_dtype: str = "float32"  # decode KV-cache storage (bfloat16 halves decode HBM traffic)
    use_flash_cross: bool = False  # Pallas flash cross-attention in training (wide memories)
    packed_stem: bool = False  # width space-to-depth conv stem (ops/packed_conv.py)
    conv_mode: str = "widened"  # packed_conv mode: 'widened' | 'patched' | 'auto'
    # Device mesh, threaded explicitly into the flash kernel's shard_map
    # (VERDICT r2 #4 — no jax-internals sniffing on the production path).
    mesh: object = None

    def setup(self):
        assert self.mixer_type in MIXER_TYPES, f"Invalid mixer type: {self.mixer_type}"
        self.image_encoder = ConvStemEncoder(dropout=self.encoder_dropout, masked_norm=self.masked_norm, remat=self.remat, packed_stem=self.packed_stem, conv_mode=self.conv_mode, name="image_encoder")
        self.audio_encoder = ConvStemEncoder(dropout=self.encoder_dropout, masked_norm=self.masked_norm, remat=self.remat, packed_stem=self.packed_stem, conv_mode=self.conv_mode, name="audio_encoder")
        self.decoder = KernDecoder(
            vocab_size=self.vocab_size,
            max_seq_len=self.max_seq_len,
            dropout=self.decoder_dropout,
            attn_window=self.attn_window,
            cache_dtype=self.cache_dtype,
            use_flash_cross=self.use_flash_cross,
            mesh=self.mesh,
            # decoder-layer remat only matters (and only costs) on the
            # no-flash XLA cross-attention path — see KernDecoder.remat
            remat=self.remat and not self.use_flash_cross,
            name="decoder",
        )
        if self.mixer_type != "concat":
            self.cross_attn = CrossAttention(name="cross_attn")
            if self.mixer_residual:
                # one zero-init gate per attention application (attn_both
                # makes two CrossAttn passes, the single-direction mixers
                # one); tanh(0)=0 => exact query passthrough at init.
                # NOTE: checkpoints saved with mixer_residual=True before
                # this param existed (or with the old fixed (2,) shape)
                # won't restore against a fresh target — acceptable: the
                # flag is off by default and every prior residual run was a
                # recorded negative result (ADVICE r4).
                n_gates = 2 if self.mixer_type == "attn_both" else 1
                self.mix_gate = self.param("mix_gate", nn.initializers.zeros, (n_gates,))

    def _pos_drop(self, x, deterministic):
        if deterministic or self.pos_dropout == 0.0:
            return x
        keep = jax.random.bernoulli(self.make_rng("dropout"), 1.0 - self.pos_dropout, x.shape)
        return jnp.where(keep, x / (1.0 - self.pos_dropout), 0.0)

    def _encode_one(self, encoder, x, hw, deterministic):
        valid = None
        if hw is not None and self.masked_norm:
            hh = jnp.arange(x.shape[1])[None, :, None] < hw[:, 0][:, None, None]
            ww = jnp.arange(x.shape[2])[None, None, :] < hw[:, 1][:, None, None]
            valid = hh & ww
        feats = encoder(x, deterministic=deterministic, valid=valid)
        mem = self._pos_drop(add_pos2d_and_flatten(feats), deterministic)
        if self.memory_partition is not None:
            import jax as _jax
            from jax.sharding import PartitionSpec as _P
            mem = _jax.lax.with_sharding_constraint(mem, _P(*self.memory_partition))
        mem_valid = None
        if hw is not None:
            mem_valid = memory_valid_from_hw(hw, feats.shape[1], feats.shape[2], self.prefix_memory_mask)
        return mem, mem_valid

    def mix(
        self,
        xi: jnp.ndarray,
        xa: jnp.ndarray,
        vi: Optional[jnp.ndarray],
        va: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Fuse encoded modalities -> (memory, memory_valid)."""
        if self.mixer_type == "concat":
            x = jnp.concatenate([xi, xa], axis=1)
            v = jnp.concatenate([vi, va], axis=1) if (vi is not None and va is not None) else None
            return x, v
        res = self.mixer_residual  # memory = query + tanh(gate)*attended
        g = jnp.tanh(self.mix_gate) if res else None
        if self.mixer_type == "attn_img":
            out = self.cross_attn(xa, xi, va, vi, deterministic)
            return (xa + g[0] * out if res else out), va
        if self.mixer_type == "attn_audio":
            out = self.cross_attn(xi, xa, vi, va, deterministic)
            return (xi + g[0] * out if res else out), vi
        # attn_both — reference dataflow quirk preserved (model.py:723-725):
        # second pass attends to the attended audio.
        xa2 = self.cross_attn(xa, xi, va, vi, deterministic)
        if res:
            xa2 = xa + g[0] * xa2
        xi2 = self.cross_attn(xi, xa2, vi, va, deterministic)
        if res:
            xi2 = xi + g[1] * xi2
        x = jnp.concatenate([xi2, xa2], axis=1)
        v = jnp.concatenate([vi, va], axis=1) if (vi is not None and va is not None) else None
        return x, v

    def encoder_forward(
        self,
        xi: Optional[jnp.ndarray],
        xa: Optional[jnp.ndarray],
        xi_hw: Optional[jnp.ndarray] = None,
        xa_hw: Optional[jnp.ndarray] = None,
        modality: str = "both",
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Encode + fuse. ``modality`` is a *static* choice ("image",
        "audio", "both") drawn on the host during training (modality
        dropout, reference model.py:561-575); only the needed encoders run."""
        if modality == "image":
            return self._encode_one(self.image_encoder, xi, xi_hw, deterministic)
        if modality == "audio":
            return self._encode_one(self.audio_encoder, xa, xa_hw, deterministic)
        mi, vi = self._encode_one(self.image_encoder, xi, xi_hw, deterministic)
        ma, va = self._encode_one(self.audio_encoder, xa, xa_hw, deterministic)
        return self.mix(mi, ma, vi, va, deterministic)

    def __call__(
        self,
        xi: Optional[jnp.ndarray],
        xi_hw: Optional[jnp.ndarray],
        xa: Optional[jnp.ndarray],
        xa_hw: Optional[jnp.ndarray],
        y_in: jnp.ndarray,
        modality: str = "both",
        deterministic: bool = True,
    ) -> jnp.ndarray:
        memory, mem_valid = self.encoder_forward(xi, xa, xi_hw, xa_hw, modality, deterministic)
        return self.decoder(
            y_in, memory, mem_valid, deterministic=deterministic, torch_float_parity=self.torch_float_parity
        )

    # Decode-path helpers
    def decode_prefill(self, xi, xa, xi_hw=None, xa_hw=None, modality: str = "both", deterministic: bool = True):
        memory, mem_valid = self.encoder_forward(xi, xa, xi_hw, xa_hw, modality, deterministic)
        return self.decoder.prefill(memory), mem_valid

    def decode_step(self, token_ids, pos, cache, cross, memory_valid=None):
        return self.decoder.step(token_ids, pos, cache, cross, memory_valid)

    def decode_init_cache(self, batch: int):
        return self.decoder.init_cache(batch)
