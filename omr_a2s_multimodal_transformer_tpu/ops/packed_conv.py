"""Width space-to-depth ("lane-packed") convolutions for the small-channel
conv stem.

Why: the reference stem (``/root/reference/src/transformer/encoder.py:241-291``)
opens with full-resolution convs at 1..64 channels. On TPU, NHWC tensors put
channels in the 128-wide lane dimension, so C=16 runs the VPU/MXU at 12.5%
lane utilization — profiling the flagship 361x4412 train step shows blocks
0-2 at 82-147 GB/s effective (10-18% of HBM) and 71% of total step time.

Fix: repack ``[B, H, W, C] -> [B, H, W/f, f*C]`` (a pure reshape — width
stays row-major within each packed cell) and run the convs with *exactly
equivalent* rearranged kernels. The underlying parameters keep their
reference shapes ``[kh, kw, ci, co]``; the widened kernel is a static
scatter of those weights computed under jit (tiny), so checkpoints, torch
import, and param counts are unchanged and gradients flow through the
scatter. FLOPs grow by ~f per conv but these ops are bandwidth-bound at
<20% lane utilization, so the net is a large win (the DSC blocks at C>=128
in the same profile run at >1000 GB/s of counted bytes).

Geometry: an original conv with stride ``sw`` maps a factor-``f_in`` packed
input to a factor-``f_out`` packed output with packed-space width stride
``f_out*sw/f_in`` — integral for the stem's ladder f: 4 -> 4 -> 2 -> 1
(blocks 0,1,2 with strides 1,2,2). Zero padding in packed space represents
the original conv's zero padding exactly, because collation pads widths to
multiples of 8 (``data/collate.py:WIDTH_REDUCTION``), so no valid packed
cell ever contains out-of-image columns.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax


def choose_pack_factor(width: int, max_factor: int = 8) -> int:
    """Largest f in {8, 4, 2, 1} (capped at max_factor) dividing ``width``.

    Collated batches always have width a multiple of 8
    (``data/collate.py:WIDTH_REDUCTION``), so production shapes start at
    f=8 — 128 rep channels for the 16-channel block0, full lane
    utilization from the first conv.
    """
    for f in (8, 4, 2, 1):
        if f <= max_factor and width % f == 0:
            return f
    return 1


def pack_width(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H, W//f, f*C]; channel layout (w-slot, c), c minor."""
    if f == 1:
        return x
    b, h, w, c = x.shape
    return x.reshape(b, h, w // f, f * c)


def repack_width(x: jnp.ndarray, f_cur: int, f_new: int) -> jnp.ndarray:
    """Change pack factor f_cur -> f_new (f_new | f_cur): a pure reshape,
    since width cells and their slots are adjacent in row-major order."""
    if f_cur == f_new:
        return x
    b, h, wp, fc = x.shape
    c = fc // f_cur
    return x.reshape(b, h, wp * f_cur // f_new, f_new * c)


def widen_width_kernel(w: jnp.ndarray, f_in: int, f_out: int, sw: int) -> Tuple[jnp.ndarray, int]:
    """Rearrange an original HWIO kernel [kh, kw, ci, co] into the packed-space
    kernel [kh, kw', f_in*ci, f_out*co].

    Packed output column P, slot q_out, corresponds to original column
    ``ox = P*f_out + q_out``; the original conv reads ``ix = ox*sw + kx - kw//2``
    which lives in packed column ``P*(f_out*sw/f_in) + dJ`` slot ``q_in`` with
    ``dJ = u // f_in``, ``q_in = u % f_in``, ``u = q_out*sw + kx - kw//2``.
    Distinct (kx, q_out) never collide on (dJ, q_in, q_out). Returns the
    widened kernel and ``dmin`` (most-negative dJ; the packed left pad).
    """
    kh, kw, ci, co = w.shape
    pw = kw // 2
    offs = [(q * sw + kx - pw) // f_in for q in range(f_out) for kx in range(kw)]
    dmin, dmax = min(offs), max(offs)
    big = jnp.zeros((kh, dmax - dmin + 1, f_in * ci, f_out * co), w.dtype)
    for q in range(f_out):
        for kx in range(kw):
            u = q * sw + kx - pw
            dj, qi = u // f_in - dmin, u % f_in
            big = big.at[:, dj, qi * ci : (qi + 1) * ci, q * co : (q + 1) * co].set(w[:, kx])
    return big, dmin


def patch_kernel(w: jnp.ndarray, f_out: int, sw: int, n_cols: int) -> jnp.ndarray:
    """Rearrange an original HWIO kernel [kh, kw, ci, co] into the patch-space
    kernel [kh, 1, n_cols*ci, f_out*co] consumed by ``packed_conv(mode=
    'patched')``.

    Patch column j holds original input column ``base + j`` (base =
    P*f_in - kw//2 for packed cell P), and output slot q's tap kx reads
    original column ``base + q*sw + kx`` — so kernel2[:, 0, j*ci+c, q*co+o]
    = w[:, kx, c, o] with j = q*sw + kx. Distinct (q, kx) pairs can share a
    patch column j (sw < kw), but they write distinct (j, q) kernel slots.
    """
    kh, kw, ci, co = w.shape
    k2 = jnp.zeros((kh, 1, n_cols * ci, f_out * co), w.dtype)
    for q in range(f_out):
        for kx in range(kw):
            j = q * sw + kx
            k2 = k2.at[:, 0, j * ci:(j + 1) * ci, q * co:(q + 1) * co].set(w[:, kx])
    return k2


def packed_conv(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    f_in: int,
    f_out: int,
    stride: Tuple[int, int],
    mode: str = "widened",
) -> jnp.ndarray:
    """Packed-space equivalent of ``nn.Conv(co, (kh, kw), stride, SAME-ish)``.

    x: [B, H, Wp, f_in*ci]; w: original [kh, kw, ci, co]; returns
    [B, H', Wp', f_out*co] where H'/Wp' match the original conv output
    packed at f_out. Height behaves exactly as the original (untouched by
    packing): pad kh//2 both sides, stride sh.

    ``mode``:
      'widened' — zero-widened kernel (``widen_width_kernel``): one conv in
        packed space, but the kernel is block-sparse (each output slot uses
        kw of kw'*f_in width taps), so the MXU multiplies ~f_in/kw zeros —
        executed FLOPs ~f_in x the original conv's.
      'patched' — gather the exactly-needed neighbor columns into a patch
        tensor [B, H, Wp, n_cols*ci] (n_cols = (f_out-1)*sw + kw: pads only
        kw-1 extra columns per cell, ~(1 + (kw-1)/f_in) x input bytes) and
        run a width-1 conv against a dense-per-slot [kh, 1, n_cols*ci,
        f_out*co] kernel — executed FLOPs ~n_cols/kw x the original
        (e.g. 10/3 instead of 8 for the f=8 blocks), full 128-lane
        utilization. Requires packed-space stride 1 (f_out*sw == f_in),
        which holds for the whole stem ladder.
      'auto' — 'patched' when the geometry allows, else 'widened'.

    Both modes sum exactly the same products (plus structural zeros), so
    they are numerically equivalent to the unpacked conv up to f32
    reduction order; parameters keep reference shapes in both.
    """
    sh, sw = stride
    kh, kw = w.shape[0], w.shape[1]
    ph = kh // 2
    s_w = f_out * sw // f_in
    if s_w * f_in != f_out * sw:
        raise ValueError(f"non-integral packed stride: f_in={f_in} f_out={f_out} sw={sw}")
    if mode == "auto":
        mode = "patched" if (s_w == 1 and f_in > 1 and kw // 2 <= f_in) else "widened"
    if mode == "patched":
        if s_w != 1 or kw // 2 > f_in:
            raise ValueError(
                f"packed_conv mode='patched' needs packed-space stride 1 and "
                f"kw//2 <= f_in (f_in={f_in}, f_out={f_out}, stride={stride}, kernel={w.shape})"
            )
        return _packed_conv_patched(x, w, bias, f_in, f_out, (sh, sw))
    big, dmin = widen_width_kernel(w, f_in, f_out, sw)
    wp_in = x.shape[2]
    w_out = (wp_in * f_in // sw) // f_out  # exact: collate widths are multiples of 8
    pl = -dmin
    pr = (w_out - 1) * s_w + big.shape[1] - pl - wp_in
    # A negative right pad would make lax.conv emit MORE than w_out columns
    # silently; it cannot occur on the validated stem ladder (f 8->4->2->1),
    # so fail loudly on any future geometry outside it (advisor r2 finding).
    if pr < 0:
        raise ValueError(
            f"packed_conv geometry yields negative right pad {pr} "
            f"(f_in={f_in}, f_out={f_out}, stride={stride}, kernel={w.shape}, wp_in={wp_in})"
        )
    # Promote like nn.Conv does (activations x params): under a mixed
    # f32-params / bf16-activations caller the packed and unpacked stems
    # must stay numerically equivalent (advisor r2 finding). Callers that
    # cast params with activations (make_train_step) see no change.
    dt = jnp.promote_types(x.dtype, w.dtype)
    y = lax.conv_general_dilated(
        x.astype(dt),
        big.astype(dt),
        window_strides=(sh, s_w),
        padding=((ph, ph), (pl, pr)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + jnp.tile(bias, f_out).astype(y.dtype)


def _packed_conv_patched(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    f_in: int,
    f_out: int,
    stride: Tuple[int, int],
) -> jnp.ndarray:
    """mode='patched' body of ``packed_conv`` (see its docstring).

    Packed cell P's outputs read original columns [P*f_in - pw,
    P*f_in - pw + n_cols): the last pw columns of the LEFT neighbor cell,
    all of cell P, and the first (n_cols - pw - f_in) columns of the RIGHT
    neighbor (<= f_in each for the stem ladder — asserted by the caller).
    Zero cells at the edges reproduce the original conv's zero width-pad
    exactly (collation widths are multiples of 8, as in 'widened' mode).
    """
    sh, sw = stride
    kh, kw, ci, co = w.shape
    pw = kw // 2
    n_cols = (f_out - 1) * sw + kw
    n_right = n_cols - pw - f_in
    b, h, wp, _ = x.shape
    parts = []
    if pw > 0:
        left = jnp.pad(x, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :wp, (f_in - pw) * ci:]
        parts.append(left)
    parts.append(x)
    if n_right > 0:
        right = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:, :n_right * ci]
        parts.append(right)
    p = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
    k2 = patch_kernel(w, f_out, sw, n_cols)
    dt = jnp.promote_types(x.dtype, w.dtype)
    y = lax.conv_general_dilated(
        p.astype(dt),
        k2.astype(dt),
        window_strides=(sh, 1),
        padding=((kh // 2, kh // 2), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + jnp.tile(bias, f_out).astype(y.dtype)
