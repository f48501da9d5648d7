"""Parameter-count report for every modality x mixer configuration
(reference src/utils/get_train_params.py:27-100)."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from omr_a2s_multimodal_transformer_tpu.models import build_model


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--vocab_size", type=int, default=6997)
    p.add_argument("--max_seq_len", type=int, default=1268)
    p.add_argument("--attn_window", type=int, default=100)
    args = p.parse_args(argv)

    xi = jnp.ones((1, 32, 64, 1))
    xa = jnp.ones((1, 32, 64, 1))
    y_in = jnp.ones((1, 4), jnp.int32)
    rng = {"params": jax.random.PRNGKey(0)}

    configs = [("image", None), ("audio", None)] + [
        ("both", m) for m in ("concat", "attn_img", "attn_audio", "attn_both")
    ]
    for modality, mixer in configs:
        hp = {
            "vocab_size": args.vocab_size,
            "max_seq_len": args.max_seq_len,
            "input_modality": modality,
            "mixer_type": mixer,
            "attn_window": args.attn_window,
        }
        model, multimodal = build_model(hp)
        if multimodal:
            variables = jax.eval_shape(
                lambda: model.init(rng, xi, None, xa, None, y_in)
            )
        else:
            variables = jax.eval_shape(lambda: model.init(rng, xi, None, y_in))
        n = count_params(variables["params"])
        name = modality + (f"_{mixer}" if mixer else "")
        print(f"{name:>20}: {n:,} trainable params")


if __name__ == "__main__":
    main()
