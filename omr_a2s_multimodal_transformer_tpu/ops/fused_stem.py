"""Fused packed ConvBlock: the whole 3-conv stem block in two Pallas passes.

Why: the flagship train step is HBM-bandwidth bound (STATUS r3: 28.9% MFU
vs 60% HBM; the patched-conv experiment falsified the MXU-bound
hypothesis), and the full-resolution stem blocks are the largest traffic
sites (tools/profile_flagship.py --breakdown: image blocks 0-2 dominate).
The XLA lowering of ``PackedConvBlock`` (models/encoder.py) makes ~7
full-resolution HBM round trips per block forward: conv1 -> relu+dropout
fusion -> conv2 -> relu+dropout -> instance-norm stats pass -> normalize
pass -> conv3. Each intermediate is materialized because XLA does not fuse
across convolution boundaries.

Fused layout (this module): two passes with everything between convs kept
in VMEM —

  K1: x --[conv1 + bias + relu + dropout-site1 + conv2 + bias + relu +
      dropout-site2]--> y2, plus the instance-norm (sum, sum-of-squares)
      statistics accumulated on the way out.
  K2: y2 --[normalize (mean/inv from K1 stats) + conv3 + bias + relu +
      dropout-site3]--> out.

Forward HBM traffic drops from ~7 to ~3 tensor round trips per block.

MEASURED OUTCOME (v5e, b8 flagship shapes, tools/bench_fused_block.py):
the fused kernel compiles and is numerically exact, but LOSES to the XLA
packed_conv path — fwd 0.78x/0.78x/0.85x (block0/1/2), fwd+bwd worse
(recompute-style custom-vjp backward). Root cause: the stem blocks are
not traffic-bound at the per-block level — XLA's widened conv already
runs at ~68% MFU of the (f x inflated) widened FLOP count, i.e. the
blocks sit near the MXU roof for the FLOPs they execute, and this
kernel's in-VMEM widened dots (kh*kw' small-K dot_generals + lag-one
carry shuffles) pipeline worse than XLA's conv. The fused block therefore
stays OFF the production path; it is kept as a tested, compiling
alternative and as the measured evidence that closes the "stem
megakernel" question from STATUS r3.

WHY the FLOP-minimal 'patched' layout cannot beat 'widened' here (the
definitive close-out, r3): the MXU quantizes the contracted dimension to
128-lane weight tiles — a [M,K]@[K,N] dot costs ~M * ceil(K/128) *
ceil(N/128) tile-rows regardless of K%128. Counting K-tiles per kh tap on
the production ladder: block0 conv2 (f=8, C=128) widened kw'=2 dots of
K=128 = 2 tiles vs patched K=n*ci=160 -> ALSO 2 tiles; block1/2 conv2
(f=4/2) widened kw'=3 vs patched 2 — the only win, ~10% of stem tiles;
every conv3 is equal. So 'patched' cuts *multiplied zeros*, not MXU time,
and any gather/materialization overhead makes it a net loss — exactly
what both experiments measured (XLA patched: 359 vs 293 ms stem fwd+bwd;
a 3-dot 'split' variant prototyped in-kernel is 3 tiles/tap, never better
than widened). Mosaic also rejects the patch gather's lane/sublane-offset
concatenates, but that is moot: the tile math says there is nothing to
recover. The widened stem sits at its MXU tile-count optimum.

In-VMEM conv strategy (static ``conv_impl``):

  'widened' (default) — zero-widened kernels (packed_conv.py 'widened'
      layout): kh x kw' dots of [rows*Wp, Cin] @ [Cin, Cout]. Executes
      ~f_in x the original MACs (the widened kernel is block-sparse and
      the MXU multiplies the zeros), which is fine on a bandwidth-bound
      step — and it lowers cleanly through Mosaic.
  'patched' — in-VMEM patched im2col (the FLOP-minimal 'patched' layout,
      patch tensor built in registers): ~n_cols/kw x original MACs at one
      big [rows*Wp, kh*n_cols*ci] @ [kh*n_cols*ci, Cout] dot per conv.
      Currently interpret/CPU-only: the lane-offset gather concatenate is
      rejected by Mosaic on TPU ("unsupported tpu.concatenate layout",
      jax 0.8.x) — kept as the tested FLOP-minimal variant for when the
      relayout lands or for MXU-bound geometries elsewhere.

Equivalence: parameters are the reference-shaped [kh, kw, ci, co] kernels;
widening/patching (ops/packed_conv.py) happens outside the kernel so
checkpoints/imports are untouched and weight gradients flow through the
(static) scatter. The dropout semantics are the exact
``MixDropout.site_factors`` draw (models/encoder.py): callers pass the RAW
u8 bits tensor + (pos, use_elem, channel-factor) drawn with the same PRNG
splits, so fused and unfused paths produce identical masks from identical
keys. ``reference_block`` below is the jnp mirror used for the custom-vjp
backward (recompute style) and for f64 equivalence tests.

Geometry: requires packed-space width stride 1 (f_out*sw == f_in), which
holds on the whole stem ladder f: 8 -> 4 -> 2 -> 1 (see packed_conv.py);
height stride sh in {1, 2}. Height halos ride a lag-one carry in VMEM
scratch, so ragged tiles and image borders reproduce the original conv's
zero padding exactly.

Reference behavior being reproduced: ConvBlock of
``/root/reference/src/transformer/encoder.py:107-181`` (3x conv + relu,
positioned MixDropout, InstanceNorm2d(eps=1e-3) before the strided conv).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omr_a2s_multimodal_transformer_tpu.ops.packed_conv import (
    patch_kernel,
    widen_width_kernel,
)

__all__ = ["fused_packed_block", "reference_block", "make_drop_ctx"]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _default_interpret() -> bool:
    return jax.default_backend() == "cpu"


# --------------------------------------------------------------------- drop


def make_drop_ctx(rng, p: float, shape12, c_orig: int, dtype) -> Dict:
    """Draw the positioned-MixDropout randomness once, kernel-consumable.

    Mirrors ``_block_site_factors`` + ``MixDropout.site_factors``
    (models/encoder.py) bit-for-bit: same split order, same u8 Bernoulli
    (keep threshold quantized to 1/256), same per-original-channel
    channel-dropout factor tiled over packed slots.

    shape12 = (B, H, Wp, C) with C = f * c_orig (slot-major, c minor).
    """
    b, h, wp, c_rep = shape12
    f = c_rep // c_orig
    r_pos, r_site = jax.random.split(rng)
    pos = jax.random.randint(r_pos, (), 1, 4)
    r_coin, r_elem, r_chan = jax.random.split(r_site, 3)
    use_elem = jax.random.bernoulli(r_coin, 0.5)
    bits = jax.random.bits(r_elem, shape12, jnp.uint8)
    keep_c = jax.random.bernoulli(r_chan, 1.0 - p / 2.0, (b, 1, 1, c_orig))
    inv_c = jnp.asarray(1.0 / (1.0 - p / 2.0), jnp.float32)
    f_chan = jnp.tile(keep_c.astype(jnp.float32) * inv_c, (1, 1, 1, f))[:, 0, 0, :]  # [B, C]
    t = int(round((1.0 - p) * 256.0))
    return {
        "bits": bits,                       # [B, H, Wp, C] u8
        "f_chan": f_chan,                   # [B, C] f32 (tiled over slots)
        "pos": pos.astype(jnp.int32),       # scalar 1..3
        "use_elem": use_elem.astype(jnp.int32),
        "t": t,                             # static keep threshold (u8 compare)
        "inv_e": float(1.0 / (1.0 - p)),    # static elem scale
    }


def _site_factor(drop: Optional[Dict], site: int, bits, fchan, dtype):
    """Multiplicative factor for one dropout site from raw draws.

    bits: [..., C'] u8 slice; fchan: [C'] or [B-broadcastable, C'].
    Matches MixDropout.site_factors: factor where pos==site, 1 elsewhere.
    """
    if drop is None:
        return None
    f_elem = (bits < jnp.uint8(drop["t"])).astype(dtype) * jnp.asarray(drop["inv_e"], dtype)
    fac = jnp.where(drop["use_elem"] == 1, f_elem, fchan.astype(dtype))
    return jnp.where(drop["pos"] == site, fac, jnp.ones((), dtype))


# ---------------------------------------------------------- jnp reference


def reference_block(
    x: jnp.ndarray,
    w1, b1, w2, b2, w3, b3,
    *,
    f_in: int,
    f_out: int,
    stride: Tuple[int, int],
    drop: Optional[Dict] = None,
    eps: float = 1e-3,
) -> jnp.ndarray:
    """Pure-jnp mirror of the fused kernels (packed_conv + instance norm +
    site factors from the SAME raw draws). Used as the custom-vjp backward
    (recompute style) and as the equivalence oracle in tests."""
    from omr_a2s_multimodal_transformer_tpu.ops.norm import instance_norm_packed
    from omr_a2s_multimodal_transformer_tpu.ops.packed_conv import packed_conv

    sh, sw = stride
    b, h, wp, _ = x.shape
    co = w1.shape[-1]
    c_rep = f_in * co
    h3 = _cdiv(h, sh)
    c3 = f_out * co

    f1 = f2 = f3 = None
    if drop is not None:
        dt = x.dtype
        f1 = _site_factor(drop, 1, drop["bits"], drop["f_chan"][:, None, None, :], dt)
        f2 = _site_factor(drop, 2, drop["bits"], drop["f_chan"][:, None, None, :], dt)
        f3 = _site_factor(
            drop, 3, drop["bits"][:, :h3, :wp, :c3], drop["f_chan"][:, None, None, :c3], dt
        )

    def mul(v, f):
        return v if f is None else v * f

    y = packed_conv(x, w1, b1, f_in, f_in, (1, 1))
    y = mul(jax.nn.relu(y), f1).astype(x.dtype)
    y = packed_conv(y, w2, b2, f_in, f_in, (1, 1))
    y = mul(jax.nn.relu(y), f2).astype(x.dtype)
    y = instance_norm_packed(y, f_in, eps=eps)
    y = packed_conv(y.astype(x.dtype), w3, b3, f_in, f_out, stride)
    y = mul(jax.nn.relu(y), f3).astype(x.dtype)
    return y


# ------------------------------------------------------------- K1 (pass A)
#
# Grid (B, nth+1), lag-one pipeline: step i computes OUTPUT tile j = i-1
# (rows [j*th, j*th+th)) while the blocked in_specs deliver input block
# min(i, nth-1) — i.e. block j+1, the bottom halo. Scratch carries the
# previous rows ([j*th-2, j*th+th) for x, [j*th-1, j*th+th) for bits), so
# every halo row is available without manual DMAs (Mosaic requires 128-
# multiple minor dims for sliced async copies; blocked specs don't).


def _pad_w(v, left, right):
    if left == 0 and right == 0:
        return v
    return jnp.pad(v, ((0, 0), (left, right), (0, 0)))


def _patch_cols(v, f_in, ci, n_cols):
    """v [rows, Wp+2, f_in*ci] (one halo cell each side) ->
    [rows, Wp, n_cols*ci]: original columns [P*f_in - 1, P*f_in - 1 + n_cols)
    per packed cell P (kw=3, pw=1)."""
    rows, wp2, _ = v.shape
    wp = wp2 - 2
    n_right = n_cols - 1 - f_in
    parts = [v[:, 0:wp, (f_in - 1) * ci:], v[:, 1:wp + 1, :]]
    if n_right > 0:
        parts.append(v[:, 2:wp + 2, :n_right * ci])
    return jnp.concatenate(parts, axis=-1)


def _conv_patched(patch, wflat, rows_out, wp, acc_dtype, sh=1):
    """patch [rows_in, Wp, n_cols*ci] -> [rows_out, Wp, Cout] f32 via one
    dot against wflat [kh*n_cols*ci, Cout] (kh=3, dh-major lane order).
    sh=2 uses the even/odd pair view to avoid strided sublane reads."""
    kh = 3
    if sh == 1:
        big = jnp.concatenate([patch[dh:dh + rows_out] for dh in range(kh)], axis=-1)
    else:
        ra = patch.shape[0]
        xp = patch.reshape(ra // 2, 2, wp, patch.shape[-1])
        sls = []
        for dh in range(kh):
            q, par = divmod(dh, 2)
            sls.append(xp[q:q + rows_out, par])  # rows r*2 + dh
        big = jnp.concatenate(sls, axis=-1)
    k = big.shape[-1]
    acc = jax.lax.dot_general(
        big.reshape(rows_out * wp, k), wflat, (((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype)
    return acc.reshape(rows_out, wp, wflat.shape[-1])


def _conv_widened(v, w_ref, rows_out, wp, acc_dtype, sh=1):
    """v [rows_in, Wp + kw' - 1, Cin] -> [rows_out, Wp, Cout] via kh*kw'
    dots against the zero-widened kernel w_ref [kh, kw', Cin, Cout].
    sh=2 uses the even/odd pair view to avoid strided sublane reads."""
    kh, kw = w_ref.shape[0], w_ref.shape[1]
    cin, cout = v.shape[-1], w_ref.shape[-1]
    dn = (((1,), (0,)), ((), ()))
    acc = jnp.zeros((rows_out * wp, cout), acc_dtype)
    if sh == 1:
        for dh in range(kh):
            for dj in range(kw):
                sl = v[dh:dh + rows_out, dj:dj + wp].reshape(rows_out * wp, cin)
                acc = acc + jax.lax.dot_general(
                    sl, w_ref[dh, dj], dn, preferred_element_type=acc_dtype)
    else:  # sh == 2
        ra = v.shape[0]
        xp = v.reshape(ra // 2, 2, v.shape[1], cin)
        for dh in range(kh):
            q, par = divmod(dh, 2)
            sl_rows = xp[q:q + rows_out, par]  # rows r*2 + dh
            for dj in range(kw):
                sl = sl_rows[:, dj:dj + wp].reshape(rows_out * wp, cin)
                acc = acc + jax.lax.dot_general(
                    sl, w_ref[dh, dj], dn, preferred_element_type=acc_dtype)
    return acc.reshape(rows_out, wp, cout)


def _k1_kernel(
    scal_i, scal_f, x_ref, bits_ref, fchan_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    y2_ref, stats_ref,
    cbx, cbb,
    *, H, Wp, th, nth, ci, C, co, f, n1, n2, pad1, pad2, conv_impl,
    has_drop, acc_dtype,
):
    i = pl.program_id(1)
    out_dtype = y2_ref.dtype
    j = i - 1  # output tile index (valid for i >= 1)
    row0 = j * th - 2  # first row held in the assembled x window

    @pl.when(i == 0)
    def _init_carry():
        # cbx <- rows [-2, th): two zero border rows + block 0
        cbx[0:2] = jnp.zeros((2,) + cbx.shape[1:], cbx.dtype)
        cbx[2:] = x_ref[0]
        if has_drop:
            cbb[0:1] = jnp.zeros((1, Wp, C), cbb.dtype)
            cbb[1:] = bits_ref[0]

    @pl.when(i == 0)
    def _placeholder_out():
        y2_ref[0] = jnp.zeros_like(y2_ref[0])

    @pl.when(i > 0)
    def _compute():
        # assembled x rows [j*th-2, j*th+th+2): carry + next block's head.
        # At i == nth the "next block" is a clamped revisit of block nth-1;
        # its head rows alias rows >= H and are zeroed by the valid masks.
        xv = jnp.concatenate([cbx[...], x_ref[0, 0:2]], axis=0)
        xv = _pad_w(xv, *pad1)
        rowsx = jax.lax.broadcasted_iota(jnp.int32, (th + 4, 1, 1), 0) + row0
        xv = jnp.where((rowsx >= 0) & (rowsx < H), xv, 0)
        if has_drop:
            bsv = jnp.concatenate([cbb[...], bits_ref[0, 0:1]], axis=0)
        else:
            bsv = None
        _k1_compute(
            xv, bsv, scal_i, scal_f, fchan_ref, w1_ref, b1_ref, w2_ref,
            b2_ref, y2_ref, stats_ref, i=i, j=j, H=H, Wp=Wp, th=th, ci=ci,
            C=C, co=co, f=f, n1=n1, n2=n2, pad2=pad2, conv_impl=conv_impl,
            has_drop=has_drop, acc_dtype=acc_dtype, out_dtype=out_dtype,
        )

    # carry update for the next step: rows [(j+1)*th-2, (j+1)*th+th)
    new_cbx_head = jnp.concatenate([cbx[th:th + 2], x_ref[0]], axis=0)
    cbx[...] = new_cbx_head
    if has_drop:
        cbb[...] = jnp.concatenate([cbb[th:th + 1], bits_ref[0]], axis=0)


def _k1_compute(
    xv, bsv, scal_i, scal_f, fchan_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    y2_ref, stats_ref,
    *, i, j, H, Wp, th, ci, C, co, f, n1, n2, pad2, conv_impl, has_drop,
    acc_dtype, out_dtype,
):
    # ---- conv1 + bias + relu + site-1 dropout -> h1 rows [j*th-1, j*th+th+1)
    if conv_impl == "patched":
        patch1 = _patch_cols(xv, f, ci, n1)
        z1 = _conv_patched(patch1, w1_ref[...], th + 2, Wp, acc_dtype)
    else:
        z1 = _conv_widened(xv, w1_ref, th + 2, Wp, acc_dtype)
    z1 = z1 + b1_ref[0].astype(acc_dtype)
    h1 = jnp.maximum(z1, 0)
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (th + 2, Wp, 1), 0) + (j * th - 1)
    valid1 = (rows1 >= 0) & (rows1 < H)
    if has_drop:
        f_elem = (bsv.astype(jnp.int32) < scal_i[2]).astype(acc_dtype) * scal_f[0].astype(acc_dtype)
        f_ch = fchan_ref[0, 0].astype(acc_dtype)[None, None, :]
        base = jnp.where(scal_i[1] == 1, f_elem, f_ch)
        one = jnp.ones((), acc_dtype)
        h1 = h1 * jnp.where(scal_i[0] == 1, base, one)
    h1 = jnp.where(valid1, h1, 0)
    hv = _pad_w(h1.astype(out_dtype), *pad2)

    # ---- conv2 + bias + relu + site-2 dropout -> y2 rows [j*th, j*th+th)
    if conv_impl == "patched":
        patch2 = _patch_cols(hv, f, co, n2)
        z2 = _conv_patched(patch2, w2_ref[...], th, Wp, acc_dtype)
    else:
        z2 = _conv_widened(hv, w2_ref, th, Wp, acc_dtype)
    z2 = z2 + b2_ref[0].astype(acc_dtype)
    y2 = jnp.maximum(z2, 0)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (th, Wp, 1), 0) + j * th
    valid2 = rows2 < H
    if has_drop:
        f_elem = (bsv[1:th + 1].astype(jnp.int32) < scal_i[2]).astype(acc_dtype) * scal_f[0].astype(acc_dtype)
        f_ch = fchan_ref[0, 0].astype(acc_dtype)[None, None, :]
        base = jnp.where(scal_i[1] == 1, f_elem, f_ch)
        one = jnp.ones((), acc_dtype)
        y2 = y2 * jnp.where(scal_i[0] == 2, base, one)
    y2 = jnp.where(valid2, y2, 0)
    y2c = y2.astype(out_dtype)
    y2_ref[0] = y2c

    # ---- instance-norm statistics of the STORED (rounded) y2.
    # Slot-fold via a 0/1 selector matmul: Mosaic can't split the minor
    # (lane) dim [C] -> [f, co], but [1,C] @ [C,co] reduces slots exactly.
    ys = y2c.astype(acc_dtype)
    flat = ys.reshape(th * Wp, C)
    t1 = flat.sum(axis=0, keepdims=True)            # [1, C]
    t2 = (flat * flat).sum(axis=0, keepdims=True)   # [1, C]
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (C, co), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (C, co), 1)
    sel = (jax.lax.rem(rows_i, jnp.asarray(co, rows_i.dtype)) == cols_i).astype(acc_dtype)
    dn = (((1,), (0,)), ((), ()))
    s1 = jax.lax.dot_general(t1, sel, dn, preferred_element_type=acc_dtype)
    s2 = jax.lax.dot_general(t2, sel, dn, preferred_element_type=acc_dtype)
    st = jnp.concatenate([s1, s2], axis=0)  # [2, co]

    @pl.when(i == 1)
    def _init():
        stats_ref[0] = st

    @pl.when(i > 1)
    def _acc():
        stats_ref[0] = stats_ref[0] + st


# ------------------------------------------------------------- K2 (pass B)


def _k2_kernel(
    scal_i, scal_f, y2_ref, bits3_ref, fchan_ref, mi_ref, w3_ref, b3_ref,
    out_ref,
    cby,
    *, H, H3, Wp, th, tho, C, C3, sh, n3, f, co, pad3, conv_impl,
    has_drop, acc_dtype,
):
    i = pl.program_id(1)
    out_dtype = out_ref.dtype
    j = i - 1                  # output tile (rows [j*tho, j*tho+tho) of H3)
    row0 = j * th - 1  # first assembled y2 row

    @pl.when(i == 0)
    def _init_carry():
        cby[0:1] = jnp.zeros((1, Wp, C), cby.dtype)
        cby[1:] = y2_ref[0]

    @pl.when(i == 0)
    def _placeholder_out():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    @pl.when(i > 0)
    def _compute():
        mean = mi_ref[0, 0].astype(acc_dtype)    # [C] (tiled per slot)
        inv = mi_ref[0, 1].astype(acc_dtype)
        # assembled y2 rows [j*th-1, j*th+th+1)
        ysv = jnp.concatenate([cby[...], y2_ref[0, 0:1]], axis=0)
        ysv = _pad_w(ysv, *pad3)
        rows_alloc = th + 2
        yv = ysv.astype(acc_dtype)
        rows = jax.lax.broadcasted_iota(jnp.int32, (rows_alloc, 1, 1), 0) + row0
        validr = (rows >= 0) & (rows < H)
        xh = (yv - mean[None, None, :]) * inv[None, None, :]
        # width borders are zero in ysv; keep them zero through the normalize
        # (conv3's zero pad is POST-norm in the reference)
        wpad = Wp + pad3[0] + pad3[1]
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, wpad, 1), 1)
        colmask = ((cols >= pad3[0]) & (cols < pad3[0] + Wp)).astype(acc_dtype)
        xh = xh * colmask
        xh = jnp.where(validr, xh, 0).astype(ysv.dtype)
        _k2_compute(
            xh, scal_i, scal_f, bits3_ref, fchan_ref, w3_ref, b3_ref, out_ref,
            rows_alloc=rows_alloc, Wp=Wp, th=th, tho=tho, C=C, C3=C3, sh=sh,
            n3=n3, f=f, co=co, conv_impl=conv_impl, has_drop=has_drop,
            acc_dtype=acc_dtype, out_dtype=out_dtype,
        )

    cby[...] = jnp.concatenate([cby[th:th + 1], y2_ref[0]], axis=0)


def _k2_compute(
    xh, scal_i, scal_f, bits3_ref, fchan_ref, w3_ref, b3_ref, out_ref,
    *, rows_alloc, Wp, th, tho, C, C3, sh, n3, f, co, conv_impl, has_drop,
    acc_dtype, out_dtype,
):
    if conv_impl == "patched":
        patch3 = _patch_cols(xh, f, co, n3)
        z3 = _conv_patched(patch3, w3_ref[...], tho, Wp, acc_dtype, sh=sh)
    else:
        z3 = _conv_widened(xh, w3_ref, tho, Wp, acc_dtype, sh=sh)
    z3 = z3 + b3_ref[0].astype(acc_dtype)
    y3 = jnp.maximum(z3, 0)
    if has_drop:
        f_elem = (bits3_ref[0, :, :, :C3].astype(jnp.int32) < scal_i[2]).astype(acc_dtype) * scal_f[0].astype(acc_dtype)
        f_ch = fchan_ref[0, 0, :C3].astype(acc_dtype)[None, None, :]
        base = jnp.where(scal_i[1] == 1, f_elem, f_ch)
        one = jnp.ones((), acc_dtype)
        y3 = y3 * jnp.where(scal_i[0] == 3, base, one)
    out_ref[0] = y3.astype(out_dtype)


# ------------------------------------------------------------------ driver


def _wk_leftpad(kw: int, f_in: int, f_out: int, sw: int) -> int:
    """-dmin of widen_width_kernel for this geometry (static)."""
    pw = kw // 2
    offs = [(q * sw + kx - pw) // f_in for q in range(f_out) for kx in range(kw)]
    return -min(offs)


def _fwd_impl(x, w1p, b1t, w2p, b2t, w3p, b3t, bits, f_chan, scal_i, scal_f,
              *, f_in, f_out, sh, eps, has_drop, th, tho, ci, co, n1, n2, n3,
              pad1, pad2, pad3, conv_impl, interpret):
    B, H, Wp, cin = x.shape
    C = f_in * co
    C3 = f_out * co
    H3 = _cdiv(H, sh)
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
    stat_dtype = acc_dtype

    nth = _cdiv(H, th)
    lastb = nth - 1

    def _wspec(w):
        nd = w.ndim
        return pl.BlockSpec(w.shape, lambda b, i, *_: (0,) * nd)

    if has_drop:
        bits_spec = pl.BlockSpec(
            (1, th, Wp, C), lambda b, i, *_: (b, jnp.minimum(i, lastb), 0, 0))
    else:
        bits_spec = pl.BlockSpec((1, 1, 1, 1), lambda b, i, *_: (0, 0, 0, 0))
        bits = jnp.zeros((1, 1, 1, 1), jnp.uint8)

    k1_scratch = [
        pltpu.VMEM((th + 2, Wp, cin), x.dtype),                      # cbx
        pltpu.VMEM((th + 1, Wp, C) if has_drop else (1, 1, 1), jnp.uint8),
    ]
    y2, stats = pl.pallas_call(
        functools.partial(
            _k1_kernel, H=H, Wp=Wp, th=th, nth=nth, ci=ci, C=C, co=co,
            f=f_in, n1=n1, n2=n2, pad1=pad1, pad2=pad2, conv_impl=conv_impl,
            has_drop=has_drop, acc_dtype=acc_dtype,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, nth + 1),
            in_specs=[
                pl.BlockSpec((1, th, Wp, cin),
                             lambda b, i, *_: (b, jnp.minimum(i, lastb), 0, 0)),
                bits_spec,
                pl.BlockSpec((1, 1, C), lambda b, i, *_: (b, 0, 0)),    # f_chan
                _wspec(w1p),                                            # w1
                pl.BlockSpec((1, C), lambda b, i, *_: (0, 0)),          # b1t
                _wspec(w2p),                                            # w2
                pl.BlockSpec((1, C), lambda b, i, *_: (0, 0)),          # b2t
            ],
            out_specs=[
                pl.BlockSpec((1, th, Wp, C),
                             lambda b, i, *_: (b, jnp.maximum(i - 1, 0), 0, 0)),
                pl.BlockSpec((1, 2, co), lambda b, i, *_: (b, 0, 0)),
            ],
            scratch_shapes=k1_scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Wp, C), x.dtype),
            jax.ShapeDtypeStruct((B, 2, co), stat_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # v5e has 128 MiB physical VMEM; the 16 MiB default scoped limit
            # is what binds the tile height. 64 MiB leaves headroom for XLA.
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(scal_i, scal_f, x, bits, f_chan[:, None, :], w1p, b1t, w2p, b2t)

    n = H * Wp * f_in
    mean = stats[:, 0] / n                       # [B, co]
    var = jnp.maximum(stats[:, 1] / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    mi = jnp.stack([jnp.tile(mean, (1, f_in)), jnp.tile(inv, (1, f_in))], axis=1)  # [B,2,C]

    # K2 tiles the strided output by tho rows; its y2 input blocks by
    # th2 = tho*sh rows (same lag-one pipeline as K1).
    th2 = tho * sh
    ntho = _cdiv(H3, tho)
    if has_drop:
        # site 3 consumes the [:, :H3, :, :C3] corner of the bits draw (same
        # slice the reference path takes). Blocks read full-C rows (block dims
        # equal to array dims are always legal) and slice channels in-kernel —
        # no materialized bits copy.
        bits3 = bits
        bits3_spec = pl.BlockSpec(
            (1, tho, Wp, C), lambda b, i, *_: (b, jnp.maximum(i - 1, 0), 0, 0))
    else:
        bits3 = jnp.zeros((1, 1, 1, 1), jnp.uint8)
        bits3_spec = pl.BlockSpec((1, 1, 1, 1), lambda b, i, *_: (0, 0, 0, 0))

    out = pl.pallas_call(
        functools.partial(
            _k2_kernel, H=H, H3=H3, Wp=Wp, th=th2, tho=tho, C=C, C3=C3,
            sh=sh, n3=n3, f=f_in, co=co, pad3=pad3, conv_impl=conv_impl,
            has_drop=has_drop, acc_dtype=acc_dtype,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, ntho + 1),
            in_specs=[
                pl.BlockSpec((1, th2, Wp, C),
                             lambda b, i, *_: (b, jnp.minimum(i, ntho - 1), 0, 0)),
                bits3_spec,                             # bits corner (site 3)
                pl.BlockSpec((1, 1, C), lambda b, i, *_: (b, 0, 0)),  # f_chan
                pl.BlockSpec((1, 2, C), lambda b, i, *_: (b, 0, 0)),  # mean/inv
                _wspec(w3p),
                pl.BlockSpec((1, C3), lambda b, i, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, tho, Wp, C3), lambda b, i, *_: (b, jnp.maximum(i - 1, 0), 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((th2 + 1, Wp, C), x.dtype),               # cby
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H3, Wp, C3), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # v5e has 128 MiB physical VMEM; the 16 MiB default scoped limit
            # is what binds the tile height. 64 MiB leaves headroom for XLA.
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(scal_i, scal_f, y2, bits3, f_chan[:, None, :], mi, w3p, b3t)
    return out


@functools.lru_cache(maxsize=32)
def _make_fused(f_in: int, f_out: int, sh: int, sw: int, eps: float,
                has_drop: bool, t: int, inv_e: float,
                th: int, tho: int, conv_impl: str, interpret: bool):
    """One custom_vjp per static config. Differentiable in (x, w1..b3);
    backward is the recompute-style vjp of ``reference_block`` (exact same
    math; Pallas backward kernels are the planned next stage)."""

    n1 = n2 = f_in + 2           # conv1/conv2: f_out=f_in, sw=1, kw=3
    n3 = (f_out - 1) * sw + 3    # conv3

    def _flat(k2):
        # patch_kernel [kh, 1, n*ci, Cout] -> [kh*n*ci, Cout], dh-major
        return jnp.concatenate([k2[dh, 0] for dh in range(k2.shape[0])], axis=0)

    if conv_impl == "patched":
        # one halo CELL each side for the in-register gather
        pad1 = pad2 = pad3 = (1, 1)

        def prep_all(w1, b1, w2, b2, w3, b3):
            w1p = _flat(patch_kernel(w1, f_in, 1, n1))
            w2p = _flat(patch_kernel(w2, f_in, 1, n2))
            w3p = _flat(patch_kernel(w3, f_out, sw, n3))
            b1t = jnp.tile(b1, f_in)[None, :]
            b2t = jnp.tile(b2, f_in)[None, :]
            b3t = jnp.tile(b3, f_out)[None, :]
            return w1p, b1t, w2p, b2t, w3p, b3t
    else:
        # widened-kernel left pads (packed_conv: pl = -dmin); the widened
        # kernel width kw' is whatever widen_width_kernel produces.
        _pl1 = _wk_leftpad(3, f_in, f_in, 1)
        _pl2 = _wk_leftpad(3, f_in, f_in, 1)
        _pl3 = _wk_leftpad(3, f_in, f_out, sw)

        def prep_all(w1, b1, w2, b2, w3, b3):
            w1p, _ = widen_width_kernel(w1, f_in, f_in, 1)
            w2p, _ = widen_width_kernel(w2, f_in, f_in, 1)
            w3p, _ = widen_width_kernel(w3, f_in, f_out, sw)
            b1t = jnp.tile(b1, f_in)[None, :]
            b2t = jnp.tile(b2, f_in)[None, :]
            b3t = jnp.tile(b3, f_out)[None, :]
            return w1p, b1t, w2p, b2t, w3p, b3t

        # pads are completed to (l, kw'-1-l) lazily once kw' is known
        pad1, pad2, pad3 = _pl1, _pl2, _pl3

    def run_fwd(x, w1, b1, w2, b2, w3, b3, bits, f_chan, pos, use_elem):
        w1p, b1t, w2p, b2t, w3p, b3t = prep_all(w1, b1, w2, b2, w3, b3)
        ci, co = w1.shape[2], w1.shape[3]
        dt = jnp.promote_types(x.dtype, w1.dtype)
        if conv_impl == "patched":
            p1, p2, p3 = pad1, pad2, pad3
        else:
            p1 = (pad1, w1p.shape[1] - 1 - pad1)
            p2 = (pad2, w2p.shape[1] - 1 - pad2)
            p3 = (pad3, w3p.shape[1] - 1 - pad3)
        scal_i = jnp.stack([pos, use_elem, jnp.asarray(t, jnp.int32)]).astype(jnp.int32)
        # the elem-dropout scale must carry full precision in f64 tests
        scal_f = jnp.asarray([inv_e], jnp.promote_types(x.dtype, jnp.float32))
        return _fwd_impl(
            x.astype(dt), w1p.astype(dt), b1t.astype(dt), w2p.astype(dt),
            b2t.astype(dt), w3p.astype(dt), b3t.astype(dt), bits,
            f_chan, scal_i, scal_f,
            f_in=f_in, f_out=f_out, sh=sh, eps=eps, has_drop=has_drop,
            th=th, tho=tho, ci=ci, co=co, n1=n1, n2=n2, n3=n3,
            pad1=p1, pad2=p2, pad3=p3, conv_impl=conv_impl,
            interpret=interpret,
        )

    def ref(x, w1, b1, w2, b2, w3, b3, bits, f_chan, pos, use_elem):
        drop = None
        if has_drop:
            drop = {"bits": bits, "f_chan": f_chan, "pos": pos,
                    "use_elem": use_elem, "t": t, "inv_e": inv_e}
        return reference_block(
            x, w1, b1, w2, b2, w3, b3,
            f_in=f_in, f_out=f_out, stride=(sh, sw), drop=drop, eps=eps,
        )

    @jax.custom_vjp
    def fused(x, w1, b1, w2, b2, w3, b3, bits, f_chan, pos, use_elem):
        return run_fwd(x, w1, b1, w2, b2, w3, b3, bits, f_chan, pos, use_elem)

    def fwd_rule(x, w1, b1, w2, b2, w3, b3, bits, f_chan, pos, use_elem):
        out = run_fwd(x, w1, b1, w2, b2, w3, b3, bits, f_chan, pos, use_elem)
        return out, (x, w1, b1, w2, b2, w3, b3, bits, f_chan, pos, use_elem)

    def bwd_rule(res, g):
        x, w1, b1, w2, b2, w3, b3, bits, f_chan, pos, use_elem = res
        _, vjp = jax.vjp(lambda *a: ref(*a, bits, f_chan, pos, use_elem),
                         x, w1, b1, w2, b2, w3, b3)
        dx, dw1, db1, dw2, db2, dw3, db3 = vjp(g)
        f0 = lambda v: np.zeros(v.shape, dtype=jax.dtypes.float0)  # noqa: E731
        dfchan = jnp.zeros_like(f_chan)
        return (dx, dw1, db1, dw2, db2, dw3, db3, f0(bits), dfchan,
                f0(pos), f0(use_elem))

    fused.defvjp(fwd_rule, bwd_rule)
    return fused


def fused_packed_block(
    x: jnp.ndarray,
    w1, b1, w2, b2, w3, b3,
    *,
    f_in: int,
    f_out: int,
    stride: Tuple[int, int],
    drop: Optional[Dict] = None,
    eps: float = 1e-3,
    tile_h: Optional[int] = None,
    conv_impl: Optional[str] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused packed ConvBlock forward (see module docstring).

    x: [B, H, Wp, f_in*ci]; w1 [kh,kw,ci,co], w2/w3 [kh,kw,co,co] in
    reference shapes; returns [B, ceil(H/sh), Wp, f_out*co]. ``drop``
    from ``make_drop_ctx`` (None = deterministic). ``conv_impl``:
    'widened' (default; TPU-lowerable) or 'patched' (FLOP-minimal;
    interpret/CPU-only today — see module docstring).
    """
    sh, sw = stride
    if f_out * sw != f_in:
        raise ValueError(
            f"fused_packed_block needs packed-space width stride 1 "
            f"(f_out*sw == f_in); got f_in={f_in} f_out={f_out} sw={sw}"
        )
    if sh not in (1, 2):
        raise ValueError(f"height stride must be 1 or 2, got {sh}")
    if interpret is None:
        interpret = _default_interpret()
    if conv_impl is None:
        conv_impl = "widened"
    if conv_impl not in ("widened", "patched"):
        raise ValueError(f"conv_impl must be 'widened' or 'patched', got {conv_impl!r}")
    # the whole module (prep_all's _wk_leftpad calls, _conv_patched's column
    # gather) assumes 3x3 kernels; anything else would get mismatched pads
    # and silently wrong output (ADVICE r3)
    for name, w in (("w1", w1), ("w2", w2), ("w3", w3)):
        if tuple(w.shape[:2]) != (3, 3):
            raise ValueError(f"fused_packed_block requires 3x3 kernels; {name} is {w.shape[:2]}")
    # Tile height from the VMEM budget: the f32 accumulator [(th+2)*Wp, C]
    # dominates; keep it ~<=4 MB so scratch + double-buffered outs fit in 16.
    Wp_ = x.shape[2]
    C_ = f_in * w1.shape[-1]
    th = tile_h or max(2, min(8, (4 * 2**20) // max(1, Wp_ * C_ * 4) - 2))
    tho = max(1, th // sh)
    has_drop = drop is not None
    fn = _make_fused(
        f_in, f_out, sh, sw, float(eps), has_drop,
        int(drop["t"]) if has_drop else 255,
        float(drop["inv_e"]) if has_drop else 1.0,
        int(th), int(tho), str(conv_impl), bool(interpret),
    )
    B, _, Wp, _ = x.shape
    C = f_in * w1.shape[-1]
    if has_drop:
        bits, f_chan = drop["bits"], drop["f_chan"]
        pos, use_elem = drop["pos"], drop["use_elem"]
    else:
        bits = jnp.zeros((B, 1, Wp, C), jnp.uint8)
        f_chan = jnp.ones((B, C), jnp.float32)
        pos = jnp.zeros((), jnp.int32)
        use_elem = jnp.zeros((), jnp.int32)
    return fn(x, w1, b1, w2, b2, w3, b3, bits, f_chan, pos, use_elem)
