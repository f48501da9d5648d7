"""Block-size sweep for the packed flash cross-attention at flagship
train shapes (b8, Lq 1280, Lk ~14.3k fused memories, dropout 0.1).

The trace breakdown (tools/trace_breakdown.py) shows decoder flash at
~45% of the flagship step (~19% nominal MFU), so block-shape tuning here
moves the headline number directly. Timing is tunnel-latency amortized.

Usage: python tools/sweep_flash_blocks.py [--b 8] [--lq 1280] [--lk 14336]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from omr_a2s_multimodal_transformer_tpu.ops.flash_packed import make_flash_attention_packed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--lq", type=int, default=1280)
    ap.add_argument("--lk", type=int, default=14336)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--dh", type=int, default=64)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bq", nargs="+", type=int, default=[128, 256, 512])
    ap.add_argument("--bk", nargs="+", type=int, default=[512, 1024, 2048])
    args = ap.parse_args()

    B, H, DH = args.b, args.heads, args.dh
    LQ, LK = args.lq, args.lk
    PD = H * DH
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    q = jax.random.normal(key, (B, LQ, PD), dt)
    k = jax.random.normal(key, (B, LK, PD), dt)
    v = jax.random.normal(key, (B, LK, PD), dt)
    kv_len = jnp.full((B,), LK, jnp.int32)
    kv_valid = jnp.ones((B, LK), bool)
    seed = jnp.int32(3)

    nominal_fb = 3.5 * 4.0 * B * H * LQ * LK * DH  # fwd 4*n*d MACs->FLOPs, bwd 2.5x

    def timeit(f, *a):
        out = f(*a)
        _ = float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))

        def run(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = f(*a)
            _ = float(jnp.sum(jax.tree.leaves(o)[0][..., :1].astype(jnp.float32)))
            return time.perf_counter() - t0

        run(2)
        t1 = min(run(1) for _ in range(3))
        tn = min(run(args.iters) for _ in range(3))
        return (tn - t1) / (args.iters - 1)

    for bq in args.bq:
        for bk in args.bk:
            try:
                fa = make_flash_attention_packed(
                    n_heads=H, causal=False, window=-1,
                    block_q=bq, block_k=bk, dropout_rate=args.dropout)

                @jax.jit
                def fwdbwd(q, k, v):
                    def loss(q, k, v):
                        return jnp.sum(fa(q, k, v, kv_len, kv_valid, seed).astype(jnp.float32))
                    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

                t = timeit(fwdbwd, q, k, v)
                print(f"bq={bq:4d} bk={bk:5d}: {t*1e3:7.2f} ms fwd+bwd "
                      f"({nominal_fb/t/1e12:5.1f} nominal TFLOP/s, "
                      f"{nominal_fb/t/197e12*100:4.1f}% MFU)", flush=True)
            except Exception as e:
                print(f"bq={bq:4d} bk={bk:5d}: FAIL {str(e).splitlines()[0][:90]}",
                      flush=True)


if __name__ == "__main__":
    main()
