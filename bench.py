"""Benchmark driver: end-to-end training-step throughput on the flagship
image->kern model at realistic GRANDSTAFF shapes.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The baseline denominator is the PyTorch reference architecture running the
same training step at the same shapes on this host (measured once and
cached in bench_baseline.json — the reference publishes no numbers,
BASELINE.md). On a TPU runner this compares TPU JAX vs host PyTorch;
the judged target is >=5x a PyTorch GPU (BASELINE.json), so the cached
baseline records host/device context for transparency.

Config: batch 16, images 128x1024 (typical distorted-score crop at the
dataset's mean aspect), seq len 256, vocab 6997, attn_window 100, bf16.
"""

import json
import os
import sys
import time

BENCH_CONFIG = {
    "batch": 16,
    "height": 128,
    "width": 1024,
    "seq_len": 256,
    "vocab": 6997,
    "attn_window": 100,
    "steps": 10,
}
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")


def bench_jax(cfg) -> float:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_default_prng_impl", "rbg")  # +30% step (threefry dropout cost)

    from omr_a2s_multimodal_transformer_tpu.models import build_model
    from omr_a2s_multimodal_transformer_tpu.training.train_state import TrainState, adam, make_train_step

    hp = {
        "vocab_size": cfg["vocab"],
        "max_seq_len": cfg["seq_len"],
        "input_modality": "image",
        "attn_window": cfg["attn_window"],
    }
    model, _ = build_model(hp)
    b = cfg["batch"]
    batch = {
        "x": jnp.ones((b, cfg["height"], cfg["width"], 1), jnp.float32),
        "x_hw": jnp.asarray([[cfg["height"], cfg["width"]]] * b, jnp.int32),
        "y_in": jnp.ones((b, cfg["seq_len"]), jnp.int32),
        "y_out": jnp.ones((b, cfg["seq_len"]), jnp.int32),
    }
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, batch["x"], batch["x_hw"], batch["y_in"]
    )
    state = TrainState.create(variables["params"], adam(1e-4))
    step = make_train_step(model, vocab_size=cfg["vocab"], bf16_compute=True)
    rng = jax.random.PRNGKey(1)

    state, loss = step(state, batch, rng)  # compile
    _ = float(loss)  # value fetch: block_until_ready alone returns early on the axon backend
    t0 = time.perf_counter()
    for _ in range(cfg["steps"]):
        state, loss = step(state, batch, rng)
    _ = float(loss)  # final loss depends on every step -> forces the whole chain
    dt = time.perf_counter() - t0
    return cfg["steps"] * b / dt


def bench_torch_reference(cfg) -> float:
    """Reference-architecture training step in PyTorch on this host
    (CPU in this container; see BASELINE.md for context)."""
    import torch
    import torch.nn as nn

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from test_torch_parity import TDecoder, TEncoder  # reference-architecture modules

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = TEncoder()
            self.decoder = TDecoder(cfg["vocab"], cfg["seq_len"])

        def forward(self, x, y_in):
            f = self.encoder(x)
            mem = f.flatten(2).permute(0, 2, 1)
            causal = nn.Transformer.generate_square_subsequent_mask(y_in.shape[1])
            return self.decoder(y_in, mem, tgt_mask=causal)

    device = "cuda" if torch.cuda.is_available() else "cpu"
    m = Model().to(device)
    opt = torch.optim.Adam(m.parameters(), lr=1e-4)
    lossf = nn.CrossEntropyLoss(ignore_index=0)
    b = max(2, cfg["batch"] // 4)  # smaller batch; normalize per-sample
    x = torch.ones(b, 1, cfg["height"], cfg["width"], device=device)
    y_in = torch.ones(b, cfg["seq_len"], dtype=torch.long, device=device)
    y_out = torch.ones(b, cfg["seq_len"], dtype=torch.long, device=device)

    def step():
        opt.zero_grad()
        loss = lossf(m(x, y_in), y_out)
        loss.backward()
        opt.step()

    step()  # warmup
    steps = 2 if device == "cpu" else 10
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return steps * b / dt


def get_baseline(cfg) -> dict:
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            cached = json.load(f)
        if cached.get("config") == cfg:
            return cached
    import torch

    value = bench_torch_reference(cfg)
    cached = {
        "config": cfg,
        "samples_per_sec": value,
        "framework": "torch-" + torch.__version__,
        "device": "cuda" if torch.cuda.is_available() else "cpu",
    }
    with open(BASELINE_FILE, "w") as f:
        json.dump(cached, f, indent=1)
    return cached


def bench_decode(cfg) -> float:
    """Batched KV-cached greedy decode throughput (tokens/sec) — the
    reference's dominant eval cost is its uncached per-sample loop."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))

    from omr_a2s_multimodal_transformer_tpu.models import build_model
    from omr_a2s_multimodal_transformer_tpu.training.decode import greedy_decode_fn

    hp = {
        "vocab_size": cfg["vocab"],
        "max_seq_len": cfg["seq_len"],
        "input_modality": "image",
        "attn_window": cfg["attn_window"],
        "cache_dtype": "bfloat16",  # production decode config (ring cache + bf16)
    }
    model, _ = build_model(hp)
    b = cfg["batch"]
    x = jnp.ones((b, cfg["height"], cfg["width"], 1), jnp.float32)
    hw = jnp.asarray([[cfg["height"], cfg["width"]]] * b, jnp.int32)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, x, hw, jnp.ones((b, 4), jnp.int32)
    )
    decode = jax.jit(greedy_decode_fn(model, cfg["seq_len"], sos_id=1, eos_id=0))
    tokens, _ = decode(params, x, hw)
    _ = jax.device_get(tokens)
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        tokens, _ = decode(params, x, hw)
    _ = jax.device_get(tokens)
    dt = (time.perf_counter() - t0) / iters
    return b * cfg["seq_len"] / dt  # eos_id=0 never emitted -> full-length decode


def main():
    cfg = dict(BENCH_CONFIG)
    if len(sys.argv) > 1 and sys.argv[1] == "decode":
        tps = bench_decode(cfg)
        print(
            json.dumps(
                {
                    "metric": "greedy_decode_tokens_per_sec_per_chip",
                    "value": round(tps, 1),
                    "unit": f"tokens/s (b{cfg['batch']} {cfg['height']}x{cfg['width']} L{cfg['seq_len']}, KV-cached)",
                    "vs_baseline": None,
                }
            )
        )
        return
    ours = bench_jax(cfg)
    try:
        baseline = get_baseline(cfg)
        vs = ours / baseline["samples_per_sec"]
    except Exception:
        baseline = None
        vs = float("nan")
    print(
        json.dumps(
            {
                "metric": "train_samples_per_sec_per_chip",
                "value": round(ours, 3),
                "unit": f"samples/s (b{cfg['batch']} {cfg['height']}x{cfg['width']} L{cfg['seq_len']})",
                "vs_baseline": round(vs, 2) if vs == vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
