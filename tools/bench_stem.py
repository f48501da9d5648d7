"""Conv-stem microbench: isolate the encoder stem's train-time cost per
packed_conv mode (VERDICT r2 #5 / STATUS round-3 perf agenda).

The stem dominates flagship-step MXU work: width-packing inflates executed
conv FLOPs ~f_in x (zero-widened kernels), mode='patched' cuts that to
~n_cols/kw x (ops/packed_conv.py). This tool times fwd+bwd of the stem
alone at flagship image shapes so the conv-mode choice is attributable,
separate from decoder/flash effects.

Usage: python tools/bench_stem.py [--b 8] [--h 361] [--w 4416] [--steps 10]
"""

import argparse
import statistics
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=8)
    p.add_argument("--h", type=int, default=361)
    p.add_argument("--w", type=int, default=4416)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--modes", nargs="+",
                   default=["unpacked", "widened", "patched"])
    p.add_argument("--train", action="store_true", default=True)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    from omr_a2s_multimodal_transformer_tpu.models.encoder import ConvStemEncoder

    x = jnp.ones((args.b, args.h, args.w, 1), jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    results = {}
    for mode in args.modes:
        stem = ConvStemEncoder(
            packed_stem=(mode != "unpacked"),
            conv_mode=mode if mode != "unpacked" else "widened",
            remat=(mode == "unpacked"),  # unpacked needs remat to fit at b8
        )
        params = jax.jit(
            lambda r, xx: stem.init({"params": r}, xx, True, None)
        )(rng, x[:1].astype(jnp.float32))
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

        def loss_fn(p_, x_, key):
            y = stem.apply(p_, x_, False, None, rngs={"dropout": key})
            return jnp.sum(jnp.square(y.astype(jnp.float32)))

        grad = jax.jit(jax.grad(loss_fn))
        key = jax.random.PRNGKey(1)
        def force(gtree):
            # axon acks block_until_ready before execution finishes: honest
            # timing must FETCH a value that depends on the computation
            return float(jax.tree.leaves(gtree)[0].ravel()[0])

        try:
            g = grad(params, x, key)
            force(g)
        except Exception as e:  # noqa: BLE001 - report OOM/compile failures per mode
            print(f"{mode}: FAILED ({type(e).__name__}: {str(e)[:120]})")
            continue
        blocks = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                g = grad(params, x, key)
            force(g)
            blocks.append((time.perf_counter() - t0) / args.steps)
        dt = statistics.median(blocks)
        results[mode] = dt
        print(f"{mode}: {dt*1e3:.2f} ms/step  ({args.b/dt:.1f} samples/s fwd+bwd, stem only)")
    if "widened" in results and "patched" in results:
        print(f"patched speedup vs widened: {results['widened']/results['patched']:.3f}x")


if __name__ == "__main__":
    main()
