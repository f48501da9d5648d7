"""Flash cross-attention under a device mesh (ops/flash_packed.py
flash_attention_packed_auto): a bare pallas_call has no SPMD rule, so GSPMD
replicates the full batch onto every device; the _auto wrapper shard_maps
over the ambient mesh instead. Verified here on the 8-device CPU sim mesh
(interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from omr_a2s_multimodal_transformer_tpu.ops import flash_packed

H, DH = 4, 64
PD = H * DH
B, LQ, LK = 8, 128, 256


def _mesh(data, model):
    return Mesh(np.array(jax.devices()[: data * model]).reshape(data, model), ("data", "model"))


def _inputs():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, LQ, PD), jnp.float32)
    k = jax.random.normal(kk, (B, LK, PD), jnp.float32)
    v = jax.random.normal(kv, (B, LK, PD), jnp.float32)
    kv_len = jnp.full((B,), LK, jnp.int32)
    kv_valid = jnp.ones((B, LK), bool)
    return q, k, v, kv_len, kv_valid, jnp.int32(0)


@pytest.mark.parametrize("shape", [(8, 1), (4, 2)])
def test_sharded_flash_matches_unsharded(shape):
    args = _inputs()
    ref_fn = flash_packed.flash_attention_packed_cached(
        n_heads=H, block_q=128, block_k=128, interpret=True
    )
    ref = ref_fn(*args)
    mesh = _mesh(*shape)
    with mesh:
        auto = flash_packed.flash_attention_packed_auto(
            n_heads=H, dh=DH, batch=B, block_q=128, block_k=128, interpret=True
        )
        sh = NamedSharding(mesh, P("data"))
        sharded_args = tuple(
            jax.device_put(a, sh) if getattr(a, "ndim", 0) >= 1 else a for a in args
        )
        out = jax.jit(auto)(*sharded_args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    # The point of the wrapper: output stays batch-sharded, not replicated.
    assert out.sharding.spec[0] == "data", out.sharding


@pytest.mark.parametrize("shape,tol", [((8, 1), 2e-2), ((4, 2), 2e-2)])
def test_flash_model_forward_under_mesh(shape, tol):
    """use_flash_cross model forward under a mesh == single-device.

    Tolerance is bf16-scale: any two distinct XLA programs (sharded
    layouts change fusion decisions; tp=2 regroups the flash heads)
    reassociate differently through the kernel's bf16 boundary — even
    unsharded jit-vs-eager differs ~6e-3 here. Exact equality of the
    sharded kernel itself is covered in f32 by
    test_sharded_flash_matches_unsharded."""
    from omr_a2s_multimodal_transformer_tpu.models import build_model
    from omr_a2s_multimodal_transformer_tpu.parallel.mesh import param_shardings, shard_batch

    hp = {
        "vocab_size": 64,
        "max_seq_len": 16,
        "input_modality": "image",
        "attn_window": 8,
        "use_flash_cross": True,
    }
    model, _ = build_model(hp)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 64, 1), jnp.float32)
    hw = jnp.asarray([[32, 64]] * 8, jnp.int32)
    y_in = jnp.ones((8, 8), jnp.int32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(2)}, x, hw, y_in)
    # jitted reference: eager-vs-jit alone differs ~6e-3 through the bf16
    # flash boundary (fusion ordering), which would swamp the sharding check
    ref = jax.jit(model.apply)(params, x, hw, y_in)

    mesh = _mesh(*shape)
    with mesh:
        ps = param_shardings(params["params"], mesh)
        params_sh = {"params": jax.device_put(params["params"], ps)}
        batch = shard_batch({"x": x, "x_hw": hw, "y_in": y_in}, mesh)
        out = jax.jit(lambda p, b: model.apply(p, b["x"], b["x_hw"], b["y_in"]))(
            params_sh, batch
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=tol, atol=tol)
