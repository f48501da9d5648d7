"""Flagship max-shape train-step analysis: XLA cost analysis (FLOPs/bytes)
+ measured step time -> which roof binds. Optionally dumps a profiler trace.

Usage: python tools/profile_flagship.py [image|multimodal|bench] [--trace DIR]
"""

import argparse
import statistics
import sys
import time

sys.path.insert(0, ".")


CONFIGS = {
    # bench config (r2: 229.4 samples/s)
    "bench": dict(modality="image", b=16, ih=128, iw=1024, L=256, remat=False, flash=False),
    # unimodal image at true max shapes
    "image": dict(modality="image", b=4, ih=361, iw=4416, L=1268, remat=True, flash=False),
    # flagship multimodal at true max shapes (r2: 6.18 samples/s)
    "multimodal": dict(modality="both", b=2, ih=361, iw=4416, L=1268, remat=True, flash=True),  # collated width (mult of 8)
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", nargs="?", default="multimodal", choices=list(CONFIGS))
    p.add_argument("--trace", default=None, help="dump jax.profiler trace to this dir")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--no_flash", action="store_true")
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--packed", action="store_true", help="lane-packed conv stem")
    p.add_argument("--conv_mode", default="widened", choices=["widened", "patched", "auto"],
                   help="packed_conv kernel layout (ops/packed_conv.py)")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--breakdown", type=int, default=0,
                   help="print top-N HLO op groups by static bytes (tools/hlo_bytes.py)")
    p.add_argument("--dump_hlo", default=None, help="write optimized HLO text here")
    args = p.parse_args()
    cfg = dict(CONFIGS[args.mode])
    if args.no_flash:
        cfg["flash"] = False
    if args.no_remat:
        cfg["remat"] = False
    if args.batch:
        cfg["b"] = args.batch

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_default_prng_impl", "rbg")

    from omr_a2s_multimodal_transformer_tpu.models import build_model
    from omr_a2s_multimodal_transformer_tpu.training.train_state import TrainState, adam, make_train_step

    hp = {
        "vocab_size": 6997,
        "max_seq_len": cfg["L"],
        "input_modality": cfg["modality"],
        "attn_window": 100,
        "remat": cfg["remat"],
        "use_flash_cross": cfg["flash"],
        "packed_stem": args.packed,
        "conv_mode": args.conv_mode,
    }
    if cfg["modality"] == "both":
        hp["mixer_type"] = "concat"
    model, multimodal = build_model(hp)
    b, L = cfg["b"], cfg["L"]
    if multimodal:
        batch = {
            "xi": jnp.ones((b, cfg["ih"], cfg["iw"], 1), jnp.float32),
            "xi_hw": jnp.asarray([[cfg["ih"], cfg["iw"]]] * b, jnp.int32),
            "xa": jnp.ones((b, 195, 808, 1), jnp.float32),
            "xa_hw": jnp.asarray([[195, 808]] * b, jnp.int32),
            "y_in": jnp.ones((b, L), jnp.int32),
            "y_out": jnp.ones((b, L), jnp.int32),
        }
        init_args = (batch["xi"], batch["xi_hw"], batch["xa"], batch["xa_hw"], batch["y_in"])
    else:
        batch = {
            "x": jnp.ones((b, cfg["ih"], cfg["iw"], 1), jnp.float32),
            "x_hw": jnp.asarray([[cfg["ih"], cfg["iw"]]] * b, jnp.int32),
            "y_in": jnp.ones((b, L), jnp.int32),
            "y_out": jnp.ones((b, L), jnp.int32),
        }
        init_args = (batch["x"], batch["x_hw"], batch["y_in"])
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, *init_args)
    state = TrainState.create(variables["params"], adam(1e-4))
    step = make_train_step(model, vocab_size=hp["vocab_size"], bf16_compute=True,
                           multimodal=multimodal)
    rng = jax.random.PRNGKey(1)

    sargs = (state, batch, rng, "both") if multimodal else (state, batch, rng)
    # AOT compile for cost analysis
    t0 = time.perf_counter()
    lowered = step.lower(*sargs)  # make_train_step already returns a jitted fn
    compiled = lowered.compile()
    print(f"# compile {time.perf_counter() - t0:.1f}s")
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = ca.get("flops", float("nan"))
        bytes_acc = ca.get("bytes accessed", float("nan"))
        print(f"XLA cost analysis: {flops/1e12:.3f} TFLOP/step, {bytes_acc/1e9:.2f} GB/step")
    except Exception as e:
        flops = bytes_acc = float("nan")
        print(f"cost_analysis unavailable: {e}")
    try:
        mem = compiled.memory_analysis()
        print(f"memory: temp {mem.temp_size_in_bytes/1e9:.2f} GB, "
              f"args {mem.argument_size_in_bytes/1e9:.2f} GB, peak-ish "
              f"{(mem.temp_size_in_bytes + mem.argument_size_in_bytes)/1e9:.2f} GB")
    except Exception as e:
        print(f"memory_analysis unavailable: {e}")
    if args.breakdown:
        from tools import hlo_bytes

        hlo_bytes.print_top(compiled, top=args.breakdown)
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(compiled.as_text())
        print(f"# HLO -> {args.dump_hlo}")

    fn = compiled
    # the compiled fn takes only array args (static modality is baked in)
    sargs = sargs[:3]
    # state is donated each call: always rebind
    state, loss = fn(*sargs)
    _ = float(loss)
    blocks = []
    import contextlib

    ctx = jax.profiler.trace(args.trace) if args.trace else contextlib.nullcontext()
    with ctx:
        for _ in range(3):
            t0 = time.perf_counter()
            l_ = None
            for _ in range(args.steps):
                state, l_ = fn(*((state,) + sargs[1:]))
            _ = float(l_)
            blocks.append((time.perf_counter() - t0) / args.steps)
    dt = statistics.median(blocks)
    sps = b / dt
    print(f"measured: {dt*1e3:.1f} ms/step, {sps:.2f} samples/s "
          f"(b{b} {cfg['ih']}x{cfg['iw']} L{L} remat={cfg['remat']} flash={cfg['flash']})")
    if flops == flops:
        print(f"achieved: {flops/dt/1e12:.1f} TFLOP/s ({flops/dt/197e12*100:.1f}% MFU), "
              f"{bytes_acc/dt/1e9:.0f} GB/s ({bytes_acc/dt/819e9*100:.0f}% of 819 GB/s HBM)")


if __name__ == "__main__":
    main()
