"""Per-block microbench: fused Pallas stem block vs XLA widened packed_conv.

Times ONE PackedConvBlock-equivalent at flagship shapes, fwd-only and
fwd+bwd, per implementation:
  xla    — ops/packed_conv.py 'widened' path (production default)
  fused  — ops/fused_stem.py two-pass Pallas block (fwd Pallas; bwd is the
           recompute-style custom_vjp for now)

The flagship step is HBM-bandwidth-bound (STATUS r3), and the full-res
blocks are the largest traffic sites; this tool attributes the fused
kernel's traffic saving per block before wiring it into the encoder.

Usage: python tools/bench_fused_block.py [--b 8] [--steps 20]
"""

import argparse
import zlib
import sys
import time

sys.path.insert(0, ".")


BLOCKS = {
    # name: (f_in, f_out, stride, ci, co, H, Wp)  at flagship b8 361x4416
    "block0": (8, 8, (1, 1), 1, 16, 361, 552),
    "block1": (4, 2, (2, 2), 16, 32, 361, 1104),
    "block2": (2, 1, (2, 2), 32, 64, 181, 1104),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=8)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--blocks", nargs="+", default=list(BLOCKS))
    p.add_argument("--tile_h", type=int, default=None)
    p.add_argument("--conv_impl", default="widened", choices=["widened", "patched"])
    p.add_argument("--fwd_only", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    from omr_a2s_multimodal_transformer_tpu.ops.fused_stem import (
        fused_packed_block, make_drop_ctx, reference_block,
    )

    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    def force(v):
        leaves = jax.tree.leaves(v)
        return float(jnp.asarray(leaves[0]).reshape(-1)[0])

    def timeit(fn, *a):
        # The axon tunnel costs ~30 ms per value FETCH while dispatches are
        # async: time `steps` queued executions against one fetch and
        # subtract the 1-execution baseline, so per-call tunnel latency
        # cancels (same scheme as tools/probe timing; naive per-step fetch
        # timing is latency-dominated for anything under ~100 ms).
        fn(*a)  # compile
        force(fn(*a))

        def run(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn(*a)
            force(out)
            return time.perf_counter() - t0

        run(2)
        t1 = min(run(1) for _ in range(3))
        tn = min(run(args.steps) for _ in range(3))
        return (tn - t1) / (args.steps - 1) * 1e3

    for name in args.blocks:
        f_in, f_out, stride, ci, co, H, Wp = BLOCKS[name]
        ks = jax.random.split(jax.random.fold_in(rng, zlib.crc32(name.encode())), 8)
        x = jax.random.normal(ks[0], (args.b, H, Wp, f_in * ci), dt)
        w1 = (jax.random.normal(ks[1], (3, 3, ci, co)) * 0.3).astype(dt)
        b1 = jnp.zeros((co,), dt)
        w2 = (jax.random.normal(ks[2], (3, 3, co, co)) * 0.1).astype(dt)
        b2 = jnp.zeros((co,), dt)
        w3 = (jax.random.normal(ks[3], (3, 3, co, co)) * 0.1).astype(dt)
        b3 = jnp.zeros((co,), dt)
        drop = None
        if args.dropout > 0:
            drop = make_drop_ctx(ks[4], args.dropout, (args.b, H, Wp, f_in * co), co, dt)
        kw = dict(f_in=f_in, f_out=f_out, stride=stride)

        # NB: the drop ctx arrays must be jit ARGUMENTS — closing over its
        # eager device arrays embeds them as constants in the HLO, and the
        # 408 MB bits tensor then blows the remote-compile request size
        # (HTTP 413). t/inv_e stay static (the kernel specializes on them).
        darr = None
        if drop is not None:
            darr = {k: drop[k] for k in ("bits", "f_chan", "pos", "use_elem")}
            dstat = {k: drop[k] for k in ("t", "inv_e")}

        def to_ctx(d):
            return None if d is None else {**d, **dstat}

        def fwd_x_fn(a, d):
            return reference_block(*a, drop=to_ctx(d), **kw)

        def fwd_f_fn(a, d):
            return fused_packed_block(*a, drop=to_ctx(d), tile_h=args.tile_h,
                                      conv_impl=args.conv_impl,
                                      interpret=False, **kw)

        fwd_x = jax.jit(fwd_x_fn)
        fwd_f = jax.jit(fwd_f_fn)

        def mkloss(f):
            def loss(a, d):
                return jnp.sum(jnp.square(f(a, d).astype(jnp.float32)))
            return jax.jit(jax.grad(loss, argnums=0))

        g_x = mkloss(fwd_x_fn)
        g_f = mkloss(fwd_f_fn)

        a7 = ((x, w1, b1, w2, b2, w3, b3), darr)
        # numerics sanity on-device at bf16
        of, ox = fwd_f(*a7), fwd_x(*a7)
        err = float(jnp.max(jnp.abs(of.astype(jnp.float32) - ox.astype(jnp.float32))))
        t_fx = timeit(fwd_x, *a7)
        t_ff = timeit(fwd_f, *a7)
        if args.fwd_only:
            print(f"{name}: fwd xla {t_fx:7.2f} ms | fused {t_ff:7.2f} ms "
                  f"({t_fx/t_ff:4.2f}x) | bf16 max|d| {err:.2e}")
            continue
        t_gx = timeit(g_x, *a7)
        t_gf = timeit(g_f, *a7)
        print(f"{name}: fwd xla {t_fx:7.2f} ms | fused {t_ff:7.2f} ms ({t_fx/t_ff:4.2f}x)"
              f" || fwd+bwd xla {t_gx:7.2f} ms | fused(recompute) {t_gf:7.2f} ms"
              f" ({t_gx/t_gf:4.2f}x) | bf16 max|d| {err:.2e}")


if __name__ == "__main__":
    main()
