"""Isolate decode-step costs at flagship shapes (b8, S=12696, 8 layers).

Variants, each a 1268-iteration lax.while_loop:
  empty   : loop overhead floor
  cross_a : 8x cross-attend, KV [B,S,H,64] bf16 (current layout)
  cross_b : 8x cross-attend, KV [B,H,64,S] bf16 (S in lanes)
  cross_c : 8x packed block-diag trick, KV [B,S,256] bf16 (lane-aligned)
  rest    : everything except cross-attend (self ring cache + FF + projs x8)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

B, S, H, DH, D, L, NL = 8, 12696, 4, 64, 256, 1268, 8
STEPS = 1268


def run(name, body_fn, carry_init, consts=()):
    def cond(state):
        i, _ = state
        return i < STEPS

    @jax.jit
    def f(c, *consts):
        def body(state):
            i, cc = state
            return i + 1, body_fn(i, cc, *consts)

        return jax.lax.while_loop(cond, body, (jnp.int32(0), c))[1]

    out = f(carry_init, *consts)
    jax.tree.map(lambda t: t.block_until_ready(), out)
    # honest timing: fetch a value that depends on the computation
    leaf = jax.tree.leaves(out)[0]
    _ = float(jnp.sum(leaf[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    out = f(carry_init, *consts)
    leaf = jax.tree.leaves(out)[0]
    _ = float(jnp.sum(leaf[..., :1].astype(jnp.float32)))
    dt = time.perf_counter() - t0
    print(f"{name:10s}: {dt:6.2f}s total, {dt/STEPS*1e3:6.3f} ms/step")
    return dt


def main():
    which = sys.argv[1:] if len(sys.argv) > 1 else ["empty", "cross_a", "cross_b", "cross_c", "rest"]
    key = jax.random.PRNGKey(0)

    if "empty" in which:
        run("empty", lambda i, c: c + 1.0, jnp.zeros((8, 128), jnp.float32))

    if "cross_a" in which:
        ks = jax.random.normal(key, (NL, B, S, H, DH), jnp.bfloat16)
        vs = jax.random.normal(key, (NL, B, S, H, DH), jnp.bfloat16)

        def body_a(i, x, ks, vs):  # x [B, 1, D]
            for l in range(NL):
                q = x.reshape(B, 1, H, DH)
                logits = jnp.einsum("bqhd,bkhd->bhqk", q, ks[l].astype(jnp.float32) if False else ks[l],
                                    preferred_element_type=jnp.float32) * 0.125
                w = jax.nn.softmax(logits, axis=-1)
                o = jnp.einsum("bhqk,bkhd->bqhd", w.astype(jnp.bfloat16), vs[l],
                               preferred_element_type=jnp.float32)
                x = x + o.reshape(B, 1, D).astype(x.dtype)
            return x

        run("cross_a", body_a, jnp.ones((B, 1, D), jnp.float32), (ks, vs))

    if "cross_b" in which:
        ks = jax.random.normal(key, (NL, B, H, DH, S), jnp.bfloat16)
        vs = jax.random.normal(key, (NL, B, H, DH, S), jnp.bfloat16)

        def body_b(i, x, ks, vs):
            for l in range(NL):
                q = x.reshape(B, H, DH)
                logits = jnp.einsum("bhd,bhds->bhs", q.astype(jnp.bfloat16), ks[l],
                                    preferred_element_type=jnp.float32) * 0.125
                w = jax.nn.softmax(logits, axis=-1)
                o = jnp.einsum("bhs,bhds->bhd", w.astype(jnp.bfloat16), vs[l],
                               preferred_element_type=jnp.float32)
                x = x + o.reshape(B, 1, D).astype(x.dtype)
            return x

        run("cross_b", body_b, jnp.ones((B, 1, D), jnp.float32), (ks, vs))

    if "cross_c" in which:
        ks = jax.random.normal(key, (NL, B, S, D), jnp.bfloat16)
        vs = jax.random.normal(key, (NL, B, S, D), jnp.bfloat16)
        # block-diagonal expander: maps [B, 256] q into [B, 256, 4] so that
        # K @ Qbd gives per-head logits [B, S, H]
        eye = jnp.zeros((D, H), jnp.bfloat16)
        rows = jnp.arange(D)
        eye = eye.at[rows, rows // DH].set(1.0)  # selector: col h sums dims of head h

        def body_c(i, x, ks, vs):
            for l in range(NL):
                q = x.reshape(B, D).astype(jnp.bfloat16)
                # Qbd[b, d, h] = q[b, d] if d in head h else 0
                qbd = q[:, :, None] * eye[None]
                logits = jnp.einsum("bsd,bdh->bsh", ks[l], qbd,
                                    preferred_element_type=jnp.float32) * 0.125
                w = jax.nn.softmax(logits, axis=1)  # over S
                o_full = jnp.einsum("bsh,bsd->bhd", w.astype(jnp.bfloat16), vs[l],
                                    preferred_element_type=jnp.float32)  # [B, H, 256]
                # extract block h -> out[b, h*64:(h+1)*64]
                o = o_full.reshape(B, H, H, DH)[:, jnp.arange(H), jnp.arange(H), :]
                x = x + o.reshape(B, 1, D).astype(x.dtype)
            return x

        run("cross_c", body_c, jnp.ones((B, 1, D), jnp.float32), (ks, vs))

    if "cross_i8" in which:
        # int8 KV, int8 qbd, MXU int8xint8->int32 dot; scales folded outside
        ks = jax.random.randint(key, (NL, B, S, D), -127, 127, jnp.int8)
        vs = jax.random.randint(key, (NL, B, S, D), -127, 127, jnp.int8)
        eye = jnp.zeros((D, H), jnp.int8)
        rows = jnp.arange(D)
        eye = eye.at[rows, rows // DH].set(1)

        def body_i8(i, x, ks, vs):
            for l in range(NL):
                q = x.reshape(B, D)
                qi = jnp.clip(jnp.round(q * 127.0), -127, 127).astype(jnp.int8)
                qbd = qi[:, :, None] * eye[None]
                logits = jnp.einsum("bsd,bdh->bsh", ks[l], qbd,
                                    preferred_element_type=jnp.int32).astype(jnp.float32) * (0.125 / 127.0 / 127.0)
                w = jax.nn.softmax(logits, axis=1)
                wq = jnp.clip(jnp.round(w * 127.0), -127, 127).astype(jnp.int8)
                o_full = jnp.einsum("bsh,bsd->bhd", wq, vs[l],
                                    preferred_element_type=jnp.int32).astype(jnp.float32) / (127.0 * 127.0)
                o = o_full.reshape(B, H, H, DH)[:, jnp.arange(H), jnp.arange(H), :]
                x = x + o.reshape(B, 1, D).astype(x.dtype)
            return x

        run("cross_i8", body_i8, jnp.ones((B, 1, D), jnp.float32), (ks, vs))

    if "cross_i8bf" in which:
        # int8 KV storage, converted to bf16 inside the dot (tests whether
        # XLA fuses the convert or materializes a bf16 copy per step)
        ks = jax.random.randint(key, (NL, B, S, D), -127, 127, jnp.int8)
        vs = jax.random.randint(key, (NL, B, S, D), -127, 127, jnp.int8)
        eye = jnp.zeros((D, H), jnp.bfloat16)
        rows = jnp.arange(D)
        eye = eye.at[rows, rows // DH].set(1.0)

        def body_i8bf(i, x, ks, vs):
            for l in range(NL):
                q = x.reshape(B, D).astype(jnp.bfloat16)
                qbd = q[:, :, None] * eye[None]
                logits = jnp.einsum("bsd,bdh->bsh", ks[l].astype(jnp.bfloat16), qbd,
                                    preferred_element_type=jnp.float32) * 0.125
                w = jax.nn.softmax(logits, axis=1)
                o_full = jnp.einsum("bsh,bsd->bhd", w.astype(jnp.bfloat16), vs[l].astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
                o = o_full.reshape(B, H, H, DH)[:, jnp.arange(H), jnp.arange(H), :]
                x = x + o.reshape(B, 1, D).astype(x.dtype)
            return x

        run("cross_i8bf", body_i8bf, jnp.ones((B, 1, D), jnp.float32), (ks, vs))

    if "rest" in which:
        CL = 101
        w_qkv = jax.random.normal(key, (NL, 3, D, D), jnp.float32) * 0.05
        w_ff1 = jax.random.normal(key, (NL, D, D), jnp.float32) * 0.05
        w_ff2 = jax.random.normal(key, (NL, D, D), jnp.float32) * 0.05
        w_out = jax.random.normal(key, (D, 6997), jnp.float32) * 0.05
        cache = {
            "k": jnp.zeros((NL, B, CL, H, DH), jnp.bfloat16),
            "v": jnp.zeros((NL, B, CL, H, DH), jnp.bfloat16),
        }

        def ln(x):
            m = jnp.mean(x, -1, keepdims=True)
            v = jnp.var(x, -1, keepdims=True)
            return (x - m) * jax.lax.rsqrt(v + 1e-5)

        def body_r(i, c, w_qkv, w_ff1, w_ff2, w_out):
            x, cache = c
            wr = jnp.mod(i, CL)
            for l in range(NL):
                q = (x @ w_qkv[l, 0]).reshape(B, 1, H, DH)
                k_new = (x @ w_qkv[l, 1]).reshape(B, 1, H, DH)
                v_new = (x @ w_qkv[l, 2]).reshape(B, 1, H, DH)
                ck = jax.lax.dynamic_update_slice_in_dim(cache["k"][l], k_new.astype(jnp.bfloat16), wr, axis=1)
                cv = jax.lax.dynamic_update_slice_in_dim(cache["v"][l], v_new.astype(jnp.bfloat16), wr, axis=1)
                cache = {"k": cache["k"].at[l].set(ck), "v": cache["v"].at[l].set(cv)}
                logits = jnp.einsum("bqhd,bkhd->bhqk", q, ck.astype(jnp.float32)) * 0.125
                w = jax.nn.softmax(logits, axis=-1)
                o = jnp.einsum("bhqk,bkhd->bqhd", w, cv.astype(jnp.float32))
                x = ln(x + o.reshape(B, 1, D))
                x = ln(x + jax.nn.relu(x @ w_ff1[l]) @ w_ff2[l])
            logit = x.reshape(B, D) @ w_out
            nt = jnp.argmax(logit, -1)
            x = x + jnp.float32(0.0) * nt[:, None, None].astype(jnp.float32)
            return x, cache

        run("rest", body_r, (jnp.ones((B, 1, D), jnp.float32), cache), (w_qkv, w_ff1, w_ff2, w_out))


if __name__ == "__main__":
    main()
