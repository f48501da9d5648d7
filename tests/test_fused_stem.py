"""f64 equivalence of the fused Pallas stem block vs the packed_conv
reference path (ops/fused_stem.py): forward AND gradients, with and
without positioned-MixDropout, across the whole stem ladder's geometries.

Reference behavior: ConvBlock of
/root/reference/src/transformer/encoder.py:107-181 (the packed_conv
equivalence to the unpacked stem is covered by tests/test_packed_stem.py;
these tests pin fused == packed reference, closing the chain)."""

import jax
import jax.numpy as jnp
import pytest

from omr_a2s_multimodal_transformer_tpu.ops.fused_stem import (
    fused_packed_block,
    make_drop_ctx,
    reference_block,
)

# x64 must be scoped per-test (not a module-level config.update): pytest
# imports every test module at COLLECTION time, so a module-level flip
# would silently run the whole suite under x64 (observed: order-dependent
# flake in test_cache_dtype_ser's memorization loop).


@pytest.fixture(autouse=True)
def _x64():
    with jax.enable_x64(True):
        yield

# (f_in, f_out, stride, ci, co, H, Wp) — the three packed stages of the
# production stem ladder at f=8 (models/encoder.py CONV_STAGES), tiny H/Wp.
GEOMS = {
    "block0": (8, 8, (1, 1), 1, 16, 13, 24),
    "block1": (4, 2, (2, 2), 32, 32, 13, 24),
    "block2": (2, 1, (2, 2), 64, 64, 14, 24),
}


def _mk(geom, p, seed=0):
    f_in, f_out, stride, ci, co, H, Wp = geom
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    B = 2
    x = jax.random.normal(ks[0], (B, H, Wp, f_in * ci), jnp.float64)
    w1 = jax.random.normal(ks[1], (3, 3, ci, co), jnp.float64) * 0.3
    b1 = jax.random.normal(ks[2], (co,), jnp.float64) * 0.1
    w2 = jax.random.normal(ks[3], (3, 3, co, co), jnp.float64) * 0.2
    b2 = jax.random.normal(ks[4], (co,), jnp.float64) * 0.1
    w3 = jax.random.normal(ks[5], (3, 3, co, co), jnp.float64) * 0.2
    b3 = jax.random.normal(ks[6], (co,), jnp.float64) * 0.1
    drop = None
    if p is not None:
        drop = make_drop_ctx(ks[7], p, (B, H, Wp, f_in * co), co, jnp.float64)
    kw = dict(f_in=f_in, f_out=f_out, stride=stride, drop=drop)
    return (x, w1, b1, w2, b2, w3, b3), kw


@pytest.mark.parametrize("impl", ["widened", "patched"])
@pytest.mark.parametrize("name", list(GEOMS))
@pytest.mark.parametrize("p", [None, 0.4])
def test_fused_block_fwd_equivalence_f64(name, p, impl):
    args, kw = _mk(GEOMS[name], p)
    out_f = fused_packed_block(*args, tile_h=5, conv_impl=impl, **kw)
    out_r = reference_block(*args, **kw)
    assert out_f.shape == out_r.shape
    scale = float(jnp.max(jnp.abs(out_r))) + 1e-12
    err = float(jnp.max(jnp.abs(out_f - out_r)))
    assert err / scale < 1e-12, (name, p, impl, err, scale)


@pytest.mark.parametrize("impl", ["widened", "patched"])
@pytest.mark.parametrize("name", list(GEOMS))
@pytest.mark.parametrize("p", [None, 0.4])
def test_fused_block_grads_equivalence_f64(name, p, impl):
    args, kw = _mk(GEOMS[name], p)

    def loss_f(*a):
        return jnp.sum(jnp.sin(fused_packed_block(*a, tile_h=5, conv_impl=impl, **kw)))

    def loss_r(*a):
        return jnp.sum(jnp.sin(reference_block(*a, **kw)))

    gf = jax.grad(loss_f, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
    for i, (a, b) in enumerate(zip(gf, gr)):
        s = float(jnp.max(jnp.abs(b))) + 1e-12
        e = float(jnp.max(jnp.abs(a - b)))
        assert e / s < 1e-11, (name, p, i, e, s)


def test_fused_block_rejects_bad_geometry():
    args, kw = _mk(GEOMS["block0"], None)
    kw["f_out"] = 4  # f_out*sw != f_in
    with pytest.raises(ValueError, match="width stride"):
        fused_packed_block(*args, **kw)


def test_fused_block_ragged_height_tiles():
    # H not a multiple of tile_h: edge tiles mask pad rows exactly
    args, kw = _mk(GEOMS["block1"], 0.3, seed=9)
    out_f = fused_packed_block(*args, tile_h=4, **kw)  # H=13 -> tiles 4,4,4,1
    out_r = reference_block(*args, **kw)
    scale = float(jnp.max(jnp.abs(out_r))) + 1e-12
    assert float(jnp.max(jnp.abs(out_f - out_r))) / scale < 1e-12
