"""Flagship multimodal train step at true GRANDSTAFF max shapes
(image 361x4412 + audio 195x808, L=1268, window 100, vocab 6997,
~14.3k-token fused concat memories).

Compares the XLA cross-attention path vs the head-packed Pallas flash
cross-attention path (--use_flash_cross) at training time (fwd+bwd with
attention-weight dropout in the kernel). r1 record: 6.1 (XLA) -> 7.1
(padded flash) samples/s at b2.

Usage: python tools/bench_train_max.py [batch] [flash|xla|both]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_default_prng_impl", "rbg")

from omr_a2s_multimodal_transformer_tpu.models import build_model
from omr_a2s_multimodal_transformer_tpu.training.train_state import TrainState, adam, make_train_step

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
WHICH = sys.argv[2] if len(sys.argv) > 2 else "both"
H, W = 361, 4412
AH, AW = 195, 808
L, V, WIN = 1268, 6997, 100
STEPS = 5


def run(use_flash: bool) -> float:
    hp = {
        "vocab_size": V,
        "max_seq_len": L,
        "input_modality": "both",
        "mixer_type": "concat",
        "attn_window": WIN,
        "remat": True,
        "use_flash_cross": use_flash,
    }
    model, _ = build_model(hp)
    batch = {
        "xi": jnp.ones((B, H, W, 1), jnp.float32),
        "xi_hw": jnp.asarray([[H, W]] * B, jnp.int32),
        "xa": jnp.ones((B, AH, AW, 1), jnp.float32),
        "xa_hw": jnp.asarray([[AH, AW]] * B, jnp.int32),
        "y_in": jnp.ones((B, L), jnp.int32),
        "y_out": jnp.ones((B, L), jnp.int32),
    }
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)},
        batch["xi"], batch["xi_hw"], batch["xa"], batch["xa_hw"], batch["y_in"],
    )
    state = TrainState.create(variables["params"], adam(1e-4))
    step = make_train_step(model, vocab_size=V, bf16_compute=True, multimodal=True)
    rng = jax.random.PRNGKey(1)

    state, loss = step(state, batch, rng, "both")
    _ = float(loss)
    blocks = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, loss = step(state, batch, rng, "both")
        _ = float(loss)
        blocks.append(STEPS * B / (time.perf_counter() - t0))
    return statistics.median(blocks)


def main():
    if WHICH in ("xla", "both"):
        sx = run(False)
        print(f"xla   cross-attn train: b{B}  {sx:6.2f} samples/s")
    if WHICH in ("flash", "both"):
        sf = run(True)
        print(f"flash cross-attn train: b{B}  {sf:6.2f} samples/s")
    if WHICH == "both":
        print(f"flash/xla: {sf / sx:.2f}x")


if __name__ == "__main__":
    main()
