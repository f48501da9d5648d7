"""Convolutional stem encoder (NHWC, flax.linen).

Architecture parity with the reference encoder
(``/root/reference/src/transformer/encoder.py:241-291``): 5 ConvBlocks
(channels 1->16->32->64->128->128, strides (1,1),(2,2),(2,2),(2,2),(2,1))
followed by 4 depthwise-separable DSCBlocks (128,128,128,256, stride 1) with
residual adds when shapes match. Net reduction H/16 x W/8, output 256ch.

TPU-first differences from the reference:
- NHWC layout (torch import transposes OIHW -> HWIO).
- The reference's Python-`random` stochasticity at forward time (MixDropout
  coin, per-block dropout position) is driven by explicit PRNG keys under
  jit, so one compiled program covers all draws.
- Optional mask-aware instance norm (`masked_norm=True`) removes padding
  sensitivity in bucketed batches; default False matches the reference
  (which normalizes over padded pixels too).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from omr_a2s_multimodal_transformer_tpu.ops.norm import instance_norm, instance_norm_packed
from omr_a2s_multimodal_transformer_tpu.ops.packed_conv import (
    choose_pack_factor,
    pack_width,
    packed_conv,
    repack_width,
)

HEIGHT_REDUCTION = 16
WIDTH_REDUCTION = 8


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def _bernoulli_u8(rng, p_keep: float, shape):
    """Bernoulli(p_keep) from uint8 RNG bits: rng_bit_generator emits u8
    natively, so the materialized bits tensor (the dominant HBM cost of
    full-resolution dropout masks) is 1/4 the bytes of the u32/f32 path.
    Keep probability is quantized to 1/256 — exact for the reference's
    0.5 and 0.75."""
    t = int(round(p_keep * 256.0))
    if t >= 256:
        return jnp.ones(shape, bool)
    return jax.random.bits(rng, shape, jnp.uint8) < jnp.uint8(t)


class MixDropout(nn.Module):
    """Coin-flip between elementwise dropout(p) and channel dropout(p/2)
    (reference encoder.py:87-104)."""

    dropout_prob: float = 0.4
    dropout2d_prob: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if deterministic or (self.dropout_prob == 0.0 and self.dropout2d_prob == 0.0):
            return x
        return x * self.factor(x.shape, x.dtype)

    def factor(self, shape, dtype) -> jnp.ndarray:
        """The multiplicative dropout mask (one fused multiply on x instead
        of selecting between two x-sized dropped candidates)."""
        rng = self.make_rng("dropout")
        r_coin, r_elem, r_chan = jax.random.split(rng, 3)
        use_elem = jax.random.bernoulli(r_coin, 0.5)
        keep_e = jax.random.bernoulli(r_elem, 1.0 - self.dropout_prob, shape)
        f_elem = keep_e.astype(dtype) / (1.0 - self.dropout_prob)
        b, c = shape[0], shape[-1]  # channel dropout: whole maps per (sample, channel)
        keep_c = jax.random.bernoulli(r_chan, 1.0 - self.dropout2d_prob, (b, 1, 1, c))
        f_chan = keep_c.astype(dtype) / (1.0 - self.dropout2d_prob)
        return jnp.where(use_elem, f_elem, f_chan)  # broadcasts f_chan over H, W

    def site_factors(self, shape12, shape3, pos, dtype, ch_groups=1):
        """Per-site multiplicative factors for a 3-site positioned dropout.

        Exactly one site is active per block (``pos``); the others multiply
        by 1.0. Sharing ONE elementwise draw across all three sites leaves
        the applied distribution unchanged while cutting the dominant HBM
        cost of training dropout 3x — the u32 RNG-bits tensor materialized
        at full activation resolution (plus its layout copies). Site 3
        (post-stride, ``shape3`` = (h3, w3, c3) dims) uses a corner slice of
        the same draw.

        ``ch_groups`` > 1 marks a width-packed activation whose channel dim
        is (slot, c) with ``c = C/ch_groups`` original channels: the
        channel-dropout draw is per *original* channel, tiled across slots,
        so whole feature maps drop together exactly as in the unpacked path.
        Site 3 may have fewer slots (c3 <= c12); a channel-prefix slice of
        the tiled factor is the first c3//c slots — still one draw.
        """
        rng = self.make_rng("dropout")
        r_coin, r_elem, r_chan = jax.random.split(rng, 3)
        use_elem = jax.random.bernoulli(r_coin, 0.5)
        keep_e = _bernoulli_u8(r_elem, 1.0 - self.dropout_prob, shape12)
        b, c = shape12[0], shape12[-1] // ch_groups
        keep_c = jax.random.bernoulli(r_chan, 1.0 - self.dropout2d_prob, (b, 1, 1, c))
        inv_e = jnp.asarray(1.0 / (1.0 - self.dropout_prob), dtype)
        inv_c = jnp.asarray(1.0 / (1.0 - self.dropout2d_prob), dtype)
        f_chan = keep_c.astype(dtype) * inv_c
        if ch_groups > 1:
            f_chan = jnp.tile(f_chan, (1, 1, 1, ch_groups))
        one = jnp.ones((), dtype)

        def site(s, keep_slice, fch):
            f = jnp.where(use_elem, keep_slice.astype(dtype) * inv_e, fch)
            return jnp.where(pos == s, f, one)

        h3, w3, c3 = shape3
        return (
            site(1, keep_e, f_chan),
            site(2, keep_e, f_chan),
            site(3, keep_e[:, :h3, :w3, :c3], f_chan[..., :c3]),
        )


class DepthSepConv(nn.Module):
    """Depthwise conv (+ optional activation) then 1x1 pointwise
    (reference encoder.py:12-84)."""

    out_ch: int
    kernel: Tuple[int, int] = (3, 3)
    stride: Tuple[int, int] = (1, 1)
    activation: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kh, kw = self.kernel
        pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))  # odd kernels only in this stem
        x = nn.Conv(
            features=in_ch,
            kernel_size=self.kernel,
            strides=self.stride,
            padding=pad,
            feature_group_count=in_ch,
            name="depth_conv",
        )(x)
        if self.activation:
            x = nn.relu(x)
        x = nn.Conv(features=self.out_ch, kernel_size=(1, 1), name="point_conv")(x)
        return x


def _block_site_factors(module, drop: MixDropout, x, out_ch, stride, deterministic):
    """Draw the block's dropout position and the three per-site factors
    (None when deterministic). One multiply per site: factor where active,
    1.0 elsewhere (a select between two x-sized dropped tensors would
    double the HBM traffic)."""
    if deterministic:
        return None, None, None
    pos = jax.random.randint(module.make_rng("dropout"), (), 1, 4)
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    h3, w3 = -(-h // stride[0]), -(-w // stride[1])
    return drop.site_factors((b, h, w, out_ch), (h3, w3, out_ch), pos, x.dtype)


def _mul(x, f):
    return x if f is None else x * f


class ConvBlock(nn.Module):
    """3x Conv2d with instance norm and a randomly positioned MixDropout
    (reference encoder.py:107-181)."""

    out_ch: int
    stride: Tuple[int, int] = (1, 1)
    kernel: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True, valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        k = self.kernel
        pad = ((k // 2, k // 2), (k // 2, k // 2))
        drop = MixDropout(self.dropout, self.dropout / 2)
        f1, f2, f3 = _block_site_factors(self, drop, x, self.out_ch, self.stride, deterministic)
        x = nn.Conv(self.out_ch, (k, k), padding=pad, name="conv1")(x)
        x = _mul(nn.relu(x), f1)
        x = nn.Conv(self.out_ch, (k, k), padding=pad, name="conv2")(x)
        x = _mul(nn.relu(x), f2)
        x = instance_norm(x, eps=1e-3, valid=valid)
        x = nn.Conv(self.out_ch, (3, 3), strides=self.stride, padding=((1, 1), (1, 1)), name="conv3")(x)
        x = _mul(nn.relu(x), f3)
        return x


class _ConvParams(nn.Module):
    """nn.Conv-compatible parameters (same names, shapes, init) without the
    conv apply, so ``PackedConvBlock`` shares checkpoint structure with
    ``ConvBlock`` — a model trained either way loads in the other."""

    features: int
    in_features: int
    kernel: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, self.in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class PackedConvBlock(nn.Module):
    """``ConvBlock`` computed in width-packed space (``ops/packed_conv.py``):
    identical parameters and deterministic numerics, ~f_in x better TPU lane
    utilization for the full-resolution small-channel stages that dominate
    flagship-step time. Dropout draws happen at packed shapes (identical
    distribution; channel dropout still drops whole original feature maps)."""

    out_ch: int
    stride: Tuple[int, int] = (1, 1)
    f_in: int = 4
    kernel: int = 3
    dropout: float = 0.5
    conv_mode: str = "widened"  # packed_conv mode: 'widened' | 'patched' | 'auto'

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True, valid: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        # x: [B, H, W/f_in, f_in*ci]; valid (when masked_norm): original [B, H, W]
        f = self.f_in
        sh, sw = self.stride
        f_out = max(1, f // sw)
        ci = x.shape[-1] // f
        k = self.kernel
        w1, b1 = _ConvParams(self.out_ch, ci, (k, k), name="conv1")()
        w2, b2 = _ConvParams(self.out_ch, self.out_ch, (k, k), name="conv2")()
        w3, b3 = _ConvParams(self.out_ch, self.out_ch, (3, 3), name="conv3")()
        f1 = f2 = f3 = None
        if not deterministic:
            drop = MixDropout(self.dropout, self.dropout / 2)
            pos = jax.random.randint(self.make_rng("dropout"), (), 1, 4)
            b, h, wp = x.shape[0], x.shape[1], x.shape[2]
            h3 = -(-h // sh)
            w3p = wp // max(1, f_out * sw // f)
            f1, f2, f3 = drop.site_factors(
                (b, h, wp, f * self.out_ch),
                (h3, w3p, f_out * self.out_ch),
                pos,
                x.dtype,
                ch_groups=f,
            )
        x = packed_conv(x, w1, b1, f, f, (1, 1), mode=self.conv_mode)
        x = _mul(nn.relu(x), f1)
        x = packed_conv(x, w2, b2, f, f, (1, 1), mode=self.conv_mode)
        x = _mul(nn.relu(x), f2)
        x = instance_norm_packed(x, f, eps=1e-3, valid=valid)
        x = packed_conv(x, w3, b3, f, f_out, self.stride, mode=self.conv_mode)
        x = _mul(nn.relu(x), f3)
        return x


class DSCBlock(nn.Module):
    """3x depthwise-separable convs; final conv has no activation
    (reference encoder.py:184-238)."""

    out_ch: int
    stride: Tuple[int, int] = (1, 1)
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True, valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        drop = MixDropout(self.dropout, self.dropout / 2)
        f1, f2, f3 = _block_site_factors(self, drop, x, self.out_ch, self.stride, deterministic)
        x = DepthSepConv(self.out_ch, name="conv1")(x)
        x = _mul(nn.relu(x), f1)
        x = DepthSepConv(self.out_ch, name="conv2")(x)
        x = _mul(nn.relu(x), f2)
        x = instance_norm(x, eps=1e-3, valid=valid)
        x = DepthSepConv(self.out_ch, stride=self.stride, name="conv3")(x)
        x = _mul(x, f3)
        return x


# (out_ch, stride) per stage — reference encoder.py:253-269.
CONV_STAGES = ((16, (1, 1)), (32, (2, 2)), (64, (2, 2)), (128, (2, 2)), (128, (2, 1)))
DSC_STAGES = ((128, (1, 1)), (128, (1, 1)), (128, (1, 1)), (256, (1, 1)))
OUT_CHANNELS = 256


def _shrink_valid(valid: Optional[jnp.ndarray], stride: Tuple[int, int]) -> Optional[jnp.ndarray]:
    """Track the valid-pixel mask through a strided conv (ceil semantics)."""
    if valid is None:
        return None
    sh, sw = stride
    if sh == 1 and sw == 1:
        return valid
    return valid[:, ::sh, ::sw]


class ConvStemEncoder(nn.Module):
    """Full conv stem: [B, H, W, 1] -> [B, H/16, W/8, 256].

    remat=True rematerializes each block in the backward pass (activation
    memory drops from O(sum of stage activations) to O(largest block),
    enabling bigger batches / full-size 361x4412 score images)."""

    dropout: float = 0.5
    masked_norm: bool = False
    remat: bool = False
    packed_stem: bool = False
    conv_mode: str = "widened"  # packed_conv mode: 'widened' | 'patched' | 'auto'

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        valid: Optional[jnp.ndarray] = None,  # [B, H, W] bool; used when masked_norm
    ) -> jnp.ndarray:
        # static_argnums counts self as 0 -> 2 == `deterministic`
        conv_block = nn.remat(ConvBlock, static_argnums=(2,)) if self.remat else ConvBlock
        packed_block = nn.remat(PackedConvBlock, static_argnums=(2,)) if self.remat else PackedConvBlock
        dsc_block = nn.remat(DSCBlock, static_argnums=(2,)) if self.remat else DSCBlock
        v = valid if self.masked_norm else None
        f = choose_pack_factor(x.shape[2]) if self.packed_stem else 1
        x = pack_width(x, f)
        for i, (ch, stride) in enumerate(CONV_STAGES):
            # Keep rep channels f*ch near the 128-lane width: more packing
            # buys no utilization once ch >= 128 and inflates conv FLOPs ~f.
            f_use = min(f, max(1, 128 // ch))
            x = repack_width(x, f, f_use)  # pure reshape (f_use divides f)
            if f_use > 1:
                x = packed_block(
                    ch, stride, f_in=f_use, dropout=self.dropout,
                    conv_mode=self.conv_mode, name=f"block{i}",
                )(x, deterministic, v)
                f = max(1, f_use // stride[1])
            else:
                x = conv_block(ch, stride, dropout=self.dropout, name=f"block{i}")(x, deterministic, v)
                f = 1
            v = _shrink_valid(v, stride)
        for i, (ch, stride) in enumerate(DSC_STAGES):
            xt = dsc_block(ch, stride, dropout=self.dropout, name=f"dsc{i}")(x, deterministic, v)
            x = x + xt if x.shape == xt.shape else xt  # residual when shapes match
            v = _shrink_valid(v, stride)
        return x
