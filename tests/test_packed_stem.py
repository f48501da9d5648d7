"""Width space-to-depth ("lane-packed") conv stem: exact equivalence vs the
standard stem with shared parameters (ops/packed_conv.py, encoder.py
PackedConvBlock). Reference stem: /root/reference/src/transformer/encoder.py.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from omr_a2s_multimodal_transformer_tpu.models.encoder import ConvStemEncoder
from omr_a2s_multimodal_transformer_tpu.ops.packed_conv import (
    choose_pack_factor,
    pack_width,
    packed_conv,
    repack_width,
    widen_width_kernel,
)


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize("mode", ["widened", "patched", "auto"])
@pytest.mark.parametrize(
    "f_in,sw,ci,co,k",
    [(8, 1, 1, 16, 3), (8, 1, 16, 16, 3), (4, 1, 16, 16, 3), (4, 2, 32, 32, 3), (2, 1, 32, 64, 3), (2, 2, 64, 64, 3), (1, 2, 8, 8, 3)],
)
def test_packed_conv_matches_lax_conv(f_in, sw, ci, co, k, mode):
    """packed_conv == unpacked lax conv with the original kernel, repacked
    (both kernel layouts: zero-widened and column-patched)."""
    f_out_ = max(1, f_in // sw)
    if mode == "patched" and f_out_ * sw != f_in:
        pytest.skip("patched mode needs packed-space stride 1")
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    H, W = 7, 24
    x = _rand(k1, (2, H, W, ci))
    w = _rand(k2, (k, k, ci, co))
    b = _rand(k3, (co,))
    sh = sw  # square strides in the stem
    ref = (
        jax.lax.conv_general_dilated(
            x, w, (sh, sw), ((k // 2, k // 2), (k // 2, k // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + b
    )
    f_out = f_out_
    got = packed_conv(pack_width(x, f_in), w, b, f_in, f_out, (sh, sw), mode=mode)
    wo = ref.shape[2]
    got_unpacked = got.reshape(got.shape[0], got.shape[1], got.shape[2], f_out, co).reshape(
        got.shape[0], got.shape[1], got.shape[2] * f_out, co
    )[:, :, :wo, :]
    np.testing.assert_allclose(np.asarray(got_unpacked), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_widen_kernel_no_collisions_and_mass():
    """Every original weight appears exactly once in the widened kernel."""
    w = jnp.arange(3 * 3 * 2 * 5, dtype=jnp.float32).reshape(3, 3, 2, 5) + 1.0
    big, _ = widen_width_kernel(w, 4, 2, 2)
    assert float(jnp.sum(big)) == pytest.approx(float(jnp.sum(w)) * 2)  # f_out copies
    assert int(jnp.sum(big != 0)) == w.size * 2


@pytest.mark.parametrize("conv_mode", ["widened", "patched"])
@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("hw", [(19, 48), (16, 40)])
def test_packed_stem_deterministic_equivalence(masked, hw, conv_mode):
    """Full stem, deterministic: packed == standard bit-for-allclose with the
    SAME params (checkpoint interchangeability), in both packed-conv modes."""
    H, W = hw
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, H, W, 1), jnp.float32)
    hwb = jnp.asarray([[H, W], [H - 3, W - 9]], jnp.int32)
    valid = None
    if masked:
        hh = jnp.arange(H)[None, :, None] < hwb[:, 0][:, None, None]
        ww = jnp.arange(W)[None, None, :] < hwb[:, 1][:, None, None]
        valid = hh & ww
    std = ConvStemEncoder(masked_norm=masked)
    pk = ConvStemEncoder(masked_norm=masked, packed_stem=True, conv_mode=conv_mode)
    params = std.init({"params": jax.random.PRNGKey(2)}, x, True, valid)
    # identical param trees (names, shapes) -> shared checkpoints
    params_p = pk.init({"params": jax.random.PRNGKey(2)}, x, True, valid)
    assert jax.tree.map(lambda a: a.shape, params) == jax.tree.map(lambda a: a.shape, params_p)
    # f64 kills conv-reassociation noise: any remaining diff would be a real
    # algorithmic mismatch, so the tolerance can be near machine epsilon.
    with jax.enable_x64(True):
        params64 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64), params)
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        v64 = valid if valid is None else jnp.asarray(np.asarray(valid))
        out_std = std.apply(params64, x64, True, v64)
        out_pk = pk.apply(params64, x64, True, v64)
    assert out_std.shape == out_pk.shape
    np.testing.assert_allclose(np.asarray(out_pk), np.asarray(out_std), rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("conv_mode", ["widened", "patched"])
def test_packed_stem_grad_equivalence(conv_mode):
    """Gradients w.r.t. shared params match between packed and standard
    (f64 so only a real algorithmic divergence could trip it)."""
    H, W = 17, 32
    std = ConvStemEncoder()
    pk = ConvStemEncoder(packed_stem=True, conv_mode=conv_mode)
    with jax.enable_x64(True):
        x = jax.random.uniform(jax.random.PRNGKey(3), (1, H, W, 1), jnp.float64)
        params = std.init({"params": jax.random.PRNGKey(4)}, x, True, None)
        params = jax.tree.map(lambda a: a.astype(jnp.float64), params)

        def loss(mod, p):
            y = mod.apply(p, x, True, None)
            return jnp.sum(y * y)

        g_std = jax.grad(lambda p: loss(std, p))(params)
        g_pk = jax.grad(lambda p: loss(pk, p))(params)
        flat_s, _ = jax.flatten_util.ravel_pytree(g_std)
        flat_p, _ = jax.flatten_util.ravel_pytree(g_pk)
    scale = float(np.max(np.abs(np.asarray(flat_s)))) or 1.0
    np.testing.assert_allclose(
        np.asarray(flat_p) / scale, np.asarray(flat_s) / scale, rtol=1e-9, atol=1e-9
    )


def test_packed_stem_training_smoke():
    """Stochastic (training) path: runs, finite, right shape, and the same
    rng produces output whose deviation from deterministic is plausible."""
    H, W = 16, 24
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, H, W, 1), jnp.float32)
    pk = ConvStemEncoder(packed_stem=True)
    params = pk.init({"params": jax.random.PRNGKey(6)}, x, True, None)
    y = pk.apply(params, x, False, None, rngs={"dropout": jax.random.PRNGKey(7)})
    assert y.shape == (2, H // 16 + (H % 16 > 0), W // 8, 256)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_choose_pack_factor():
    assert choose_pack_factor(4416) == 8  # collated production width (W rounds up to 8s)
    assert choose_pack_factor(4412) == 4  # raw (uncollated) max width
    assert choose_pack_factor(1024) == 8
    assert choose_pack_factor(22) == 2
    assert choose_pack_factor(21) == 1


def test_repack_width_roundtrip():
    x = jnp.arange(2 * 3 * 16 * 5, dtype=jnp.float32).reshape(2, 3, 16, 5)
    p8 = pack_width(x, 8)
    p4 = repack_width(p8, 8, 4)
    np.testing.assert_array_equal(np.asarray(p4), np.asarray(pack_width(x, 4)))
    np.testing.assert_array_equal(np.asarray(repack_width(p4, 4, 1)), np.asarray(x))
