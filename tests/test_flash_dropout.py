"""Flash in-kernel attention-weight dropout: correctness proof (VERDICT r2 #1).

The production flagship training recipe (--use_flash_cross, dropout 0.1)
applies dropout AFTER softmax inside the Pallas kernels, regenerating the
keep-mask independently in the fwd, dq, and dkv kernels
(ops/flash_packed.py:_keep_mask). A seed-mixing or iota-order mismatch
between the three would silently bias every production gradient. These
tests close that gap:

  1. Extract the exact keep-mask via the ``export_keep_masks`` probe (the
     same pure function of (seed, b, q-block, k-block) the kernels call),
     build a plain-XLA attention with that SAME mask, and assert the flash
     forward AND all of dq/dk/dv (via the custom vjp) match XLA autodiff
     of the masked reference.
  2. Same-seed determinism across calls; different seeds differ.
  3. E[out] over many seeds converges to the no-dropout output
     (unbiasedness of the p/(1-rate) scaling).
  4. Shard-seed decorrelation: with the mesh threaded EXPLICITLY (no
     ambient context), identical per-shard inputs produce different
     dropout masks per shard (flash_packed.py ``seeded()`` axis-index
     mixing), and the output stays batch-sharded (VERDICT r2 #4
     regression: not GSPMD-replicated).

Every case runs twice: interpret mode (CPU, counter-hash surrogate PRNG —
exercises the identical mask-regeneration code path everywhere) and the
real TPU core PRNG when the backend is TPU (run via
``OMR_TESTS_TPU=1 python -m pytest tests/test_flash_dropout.py``).

Reference semantics: torch MHA attention-weight dropout,
/root/reference/src/transformer/decoder.py:75-102.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from omr_a2s_multimodal_transformer_tpu.ops import flash_packed
from omr_a2s_multimodal_transformer_tpu.ops.flash_packed import (
    export_keep_masks,
    make_flash_attention_packed,
)

H, DH = 4, 64
PD = H * DH

MODES = [
    pytest.param(True, id="interpret"),
    pytest.param(
        False,
        id="tpu",
        marks=pytest.mark.skipif(
            jax.default_backend() != "tpu",
            reason="real-PRNG dropout path needs a TPU (interpret mode cannot model the core PRNG)",
        ),
    ),
]


def _inputs(b, lq, lk, seed=0):
    kq, kk, kv, kw = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(kq, (b, lq, PD), jnp.float32)
    k = jax.random.normal(kk, (b, lk, PD), jnp.float32)
    v = jax.random.normal(kv, (b, lk, PD), jnp.float32)
    w = jax.random.normal(kw, (b, lq, PD), jnp.float32)  # cotangent weights
    return q, k, v, w


def _masked_reference(q, k, v, keep, rate, kv_valid, causal=False, window=-1):
    """Plain-XLA attention applying the EXTRACTED keep-mask post-softmax
    (f32 end-to-end). keep: [B, H, Lq, Lk] bool."""
    b, lq, pd = q.shape
    lk = k.shape[1]
    dh = pd // H
    split = lambda t: t.reshape(b, t.shape[1], H, dh).transpose(0, 2, 1, 3)
    qh, kh, vh = split(q), split(k), split(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(dh)
    valid = jnp.broadcast_to(kv_valid[:, None, None, :], s.shape)
    if causal:
        i = jnp.arange(lq)[:, None]
        j = jnp.arange(lk)[None, :]
        a = j <= i
        if window > 0:
            a &= j >= i - window
        valid = valid & a[None, None]
    s = jnp.where(valid, s, flash_packed.NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    if rate > 0.0:
        p = jnp.where(keep[:, :, :lq, :lk], p / (1.0 - rate), 0.0)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(b, lq, pd)


CASES = [
    # production flash-cross config shape class: non-causal, wide memory,
    # partial kv validity, multiple k blocks
    dict(b=2, lq=256, lk=640, rate=0.5, causal=False, window=-1, bq=128, bk=512),
    dict(b=2, lq=256, lk=640, rate=0.1, causal=False, window=-1, bq=256, bk=256),
    # windowed causal (the self-attention geometry) with dropout
    dict(b=1, lq=384, lk=384, rate=0.5, causal=True, window=100, bq=128, bk=128),
]


def _flash(case, rate, interpret):
    return make_flash_attention_packed(
        n_heads=H, causal=case["causal"], window=case["window"],
        block_q=case["bq"], block_k=case["bk"], dropout_rate=rate,
        interpret=interpret,
    )


@pytest.mark.parametrize("interpret", MODES)
@pytest.mark.parametrize("case", CASES, ids=lambda c: f"lq{c['lq']}_lk{c['lk']}_r{c['rate']}_w{c['window']}")
def test_dropout_fwd_and_grads_match_masked_reference(case, interpret):
    """The core proof: fwd output and dq/dk/dv all equal XLA autodiff of a
    reference using the probe-extracted mask — so the fwd, dq, and dkv
    kernels demonstrably regenerate the SAME keep-mask."""
    b, lq, lk, rate = case["b"], case["lq"], case["lk"], case["rate"]
    q, k, v, w = _inputs(b, lq, lk)
    kv_len_val = lk - 37 if not case["causal"] else lk
    kv_len = jnp.full((b,), kv_len_val, jnp.int32)
    kv_valid = (jnp.arange(lk)[None, :] < kv_len_val) | jnp.zeros((b, lk), bool)
    seed = 12345

    keep = np.asarray(export_keep_masks(
        seed, b, H, lq, lk, dropout_rate=rate,
        block_q=case["bq"], block_k=case["bk"], interpret=interpret,
    ))

    flash = _flash(case, rate, interpret)

    def loss_flash(q, k, v):
        return jnp.sum(flash(q, k, v, kv_len, kv_valid, jnp.int32(seed)) * w)

    def loss_ref(q, k, v):
        return jnp.sum(
            _masked_reference(q, k, v, keep, rate, kv_valid,
                              causal=case["causal"], window=case["window"]) * w
        )

    o_flash = jax.jit(flash)(q, k, v, kv_len, kv_valid, jnp.int32(seed))
    o_ref = _masked_reference(q, k, v, keep, rate, kv_valid,
                              causal=case["causal"], window=case["window"])
    np.testing.assert_allclose(np.asarray(o_flash), np.asarray(o_ref), rtol=2e-4, atol=2e-4)

    g_flash = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for name, gf, gr in zip(("dq", "dk", "dv"), g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4,
            err_msg=f"{name} mismatch: fwd/bwd kernels regenerated different keep-masks",
        )


@pytest.mark.parametrize("interpret", MODES)
def test_dropout_seed_determinism(interpret):
    case = CASES[0]
    b, lq, lk = case["b"], case["lq"], case["lk"]
    q, k, v, _ = _inputs(b, lq, lk)
    kv_len = jnp.full((b,), lk, jnp.int32)
    kv_valid = jnp.ones((b, lk), bool)
    flash = jax.jit(_flash(case, 0.5, interpret))
    a1 = flash(q, k, v, kv_len, kv_valid, jnp.int32(7))
    a2 = flash(q, k, v, kv_len, kv_valid, jnp.int32(7))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    b2 = flash(q, k, v, kv_len, kv_valid, jnp.int32(8))
    assert not np.allclose(np.asarray(a1), np.asarray(b2), atol=1e-3), "seed has no effect"


@pytest.mark.parametrize("interpret", MODES)
def test_dropout_unbiased_expectation(interpret):
    """mean over seeds of dropout(out) -> no-dropout out (the 1/(1-rate)
    inverted scaling is correct)."""
    b, lq, lk, rate = 1, 128, 256, 0.5
    q, k, v, _ = _inputs(b, lq, lk, seed=3)
    kv_len = jnp.full((b,), lk, jnp.int32)
    kv_valid = jnp.ones((b, lk), bool)
    case = dict(causal=False, window=-1, bq=128, bk=128)
    drop = jax.jit(_flash(case, rate, interpret))
    nodrop = jax.jit(_flash(case, 0.0, interpret))
    base = np.asarray(nodrop(q, k, v, kv_len, kv_valid, jnp.int32(0)))
    n_seeds = 160
    acc = np.zeros_like(base)
    single_err = None
    for s in range(n_seeds):
        o = np.asarray(drop(q, k, v, kv_len, kv_valid, jnp.int32(1000 + s)))
        if single_err is None:
            single_err = np.abs(o - base).mean()
        acc += o
    mean_err = np.abs(acc / n_seeds - base).mean()
    # averaging over seeds must shrink the deviation ~1/sqrt(n); allow 4x slack
    assert mean_err < single_err * 4.0 / np.sqrt(n_seeds), (mean_err, single_err)


@pytest.mark.parametrize("interpret", MODES)
def test_probe_mask_statistics(interpret):
    """The probe itself: keep-rate ~= 1-rate, different (b, block) cells
    decorrelated, deterministic."""
    rate = 0.3
    m1 = np.asarray(export_keep_masks(5, 2, H, 256, 512, dropout_rate=rate,
                                      block_q=128, block_k=256, interpret=interpret))
    m2 = np.asarray(export_keep_masks(5, 2, H, 256, 512, dropout_rate=rate,
                                      block_q=128, block_k=256, interpret=interpret))
    np.testing.assert_array_equal(m1, m2)
    assert abs(m1.mean() - (1 - rate)) < 0.02, m1.mean()
    # batches see different masks
    assert (m1[0] != m1[1]).mean() > 0.2
    # the shard-seed mixing constant used by flash_packed.seeded() produces
    # a decorrelated stream (what distinguishes dp shards at equal local
    # batch index)
    m_shard = np.asarray(export_keep_masks(5 ^ 479001599, 2, H, 256, 512,
                                           dropout_rate=rate, block_q=128,
                                           block_k=256, interpret=interpret))
    assert (m1 != m_shard).mean() > 0.2


def test_explicit_mesh_dropout_shards_and_decorrelates():
    """Mesh threaded EXPLICITLY (mesh=..., no ambient 'with mesh:' context):
    the kernel shard_maps (output stays batch-sharded — regression for the
    jax._src ambient sniff) and identical per-shard inputs get DIFFERENT
    dropout masks per shard (seeded() axis-index mixing, previously
    zero-coverage)."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU sim mesh")
    interpret = jax.default_backend() == "cpu"
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8, 1), ("data", "model"))
    b, lq, lk = 8, 128, 256
    q1, k1, v1, _ = _inputs(1, lq, lk, seed=11)
    # identical sample replicated across the batch: every dp shard sees the
    # same data at local index 0, so equal outputs across rows == broken
    # shard-seed decorrelation
    q = jnp.tile(q1, (b, 1, 1))
    k = jnp.tile(k1, (b, 1, 1))
    v = jnp.tile(v1, (b, 1, 1))
    kv_len = jnp.full((b,), lk, jnp.int32)
    kv_valid = jnp.ones((b, lk), bool)
    auto = flash_packed.flash_attention_packed_auto(
        n_heads=H, dh=DH, batch=b, dropout_rate=0.5,
        block_q=128, block_k=128, interpret=interpret, mesh=mesh,
    )
    sh = NamedSharding(mesh, P("data"))
    args = tuple(
        jax.device_put(a, sh) if getattr(a, "ndim", 0) >= 1 else a
        for a in (q, k, v, kv_len, kv_valid)
    )
    out = jax.jit(auto)(*args, jnp.int32(21))
    assert out.sharding.spec[0] == "data", (
        f"flash output not batch-sharded ({out.sharding}) — kernel fell back "
        "to the replicated GSPMD path despite an explicit mesh"
    )
    rows = np.asarray(out)
    diffs = [
        not np.allclose(rows[i], rows[j], atol=1e-3)
        for i in range(b) for j in range(i + 1, b)
    ]
    assert all(diffs), "some dp shards produced identical dropout masks"


def test_explicit_mesh_matches_ambient_mesh():
    """flash under mesh=... (explicit) == flash under 'with mesh:' (ambient
    fallback) — same shard_map program either way."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU sim mesh")
    interpret = jax.default_backend() == "cpu"
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    b, lq, lk = 4, 128, 256
    q, k, v, _ = _inputs(b, lq, lk, seed=13)
    kv_len = jnp.full((b,), lk, jnp.int32)
    kv_valid = jnp.ones((b, lk), bool)
    sh = NamedSharding(mesh, P("data"))
    args = tuple(
        jax.device_put(a, sh) if getattr(a, "ndim", 0) >= 1 else a
        for a in (q, k, v, kv_len, kv_valid)
    ) + (jnp.int32(0),)

    explicit = flash_packed.flash_attention_packed_auto(
        n_heads=H, dh=DH, batch=b, block_q=128, block_k=128,
        interpret=interpret, mesh=mesh,
    )
    out_explicit = jax.jit(explicit)(*args)
    with mesh:
        ambient = flash_packed.flash_attention_packed_auto(
            n_heads=H, dh=DH, batch=b, block_q=128, block_k=128,
            interpret=interpret,
        )
        out_ambient = jax.jit(ambient)(*args)
    np.testing.assert_allclose(
        np.asarray(out_explicit), np.asarray(out_ambient), rtol=1e-6, atol=1e-6
    )
    assert out_explicit.sharding.spec[0] == "data"
