"""Train state + jitted train/eval step factories.

The training runtime the reference delegates to PyTorch Lightning
(Trainer: epoch loop, AMP, checkpoint/early-stop callbacks; train.py:140-154)
is implemented here as explicit jitted steps over an optax Adam state.
Mixed precision is bf16 compute with f32 params/optimizer (TPU-native;
no loss scaler needed, unlike the reference's fp16 "16-mixed").
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from omr_a2s_multimodal_transformer_tpu.training.corruption import corrupt_tokens
from omr_a2s_multimodal_transformer_tpu.training.losses import cross_entropy_ignore_pad


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(step=jnp.int32(0), params=params, opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads) -> "TrainState":
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=opt_state,
        )


def adam(lr: float = 1e-4, warmup_steps: int = 0, decay_steps: int = 0,
         clip_norm: float = 0.0, train_only=None) -> optax.GradientTransformation:
    """Adam with the reference's hyperparameters (model.py:134-139).

    Optional linear warmup + cosine decay: the post-LN decoder diverges
    above ~1e-4 without warmup (measured: lr 1e-3 collapses to unigram
    entropy; 1e-4 converges). Defaults (0, 0) keep the reference's constant
    schedule.

    clip_norm > 0 prepends global-norm gradient clipping. The reference
    (Lightning default: no clipping) never needs it at its constant 1e-4,
    but the post-LN decoder emits rare gradient spikes at lr >= 3e-4 even
    under warmup (measured: the varied-length convergence run collapsed
    2.15 -> 3.55 train loss between epochs 16-20 and settled in the
    unigram basin, val SER 352). Default 0.0 keeps reference parity.
    """
    if warmup_steps > 0 or decay_steps > 0:
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr,
            warmup_steps=max(warmup_steps, 1),
            decay_steps=max(decay_steps, warmup_steps + 1),
            end_value=lr * 0.1,
        )
    else:
        sched = lr
    tx = optax.adam(sched, b1=0.9, b2=0.999, eps=1e-8)
    if train_only:
        # Freeze every top-level param group NOT named in train_only
        # (e.g. train_only=("cross_attn", "mix_gate") trains the mixer on
        # top of frozen warm-started encoders+decoder: the warm-start
        # fine-tune at mixer LRs was measured to destroy the donor — a
        # 0.2-val-SER audio donor drifted to val 21.6 within 5 epochs).
        allowed = frozenset(train_only)

        def labels(params):
            return {k: jax.tree.map(lambda _: ("train" if k in allowed else "freeze"), v)
                    for k, v in params.items()}

        tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)
    if clip_norm and clip_norm > 0:
        return optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


def _cast_tree(tree, dtype):
    return jax.tree.map(lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def make_train_step(
    model,
    vocab_size: int,
    teacher_forcing_prob: float = 0.2,
    bf16_compute: bool = True,
    pad_id: int = 0,
    multimodal: bool = False,
) -> Callable:
    """Build the jitted train step.

    Unimodal:   step(state, batch{x, x_hw, y_in, y_out}, rng) -> (state, loss)
    Multimodal: step(state, batch{xi, xi_hw, xa, xa_hw, y_in, y_out}, rng,
                     modality) with static modality in {image, audio, both}.
    The train-state is donated (params update in place in HBM).
    """

    def loss_fn(params, batch, y_in, drop_rng, modality):
        p = _cast_tree(params, jnp.bfloat16) if bf16_compute else params
        def cast(x):
            return x.astype(jnp.bfloat16) if bf16_compute else x
        if multimodal:
            logits = model.apply(
                {"params": p},
                cast(batch["xi"]), batch["xi_hw"], cast(batch["xa"]), batch["xa_hw"], y_in,
                modality, False, rngs={"dropout": drop_rng},
            )
        else:
            logits = model.apply(
                {"params": p}, cast(batch["x"]), batch["x_hw"], y_in, False,
                rngs={"dropout": drop_rng},
            )
        return cross_entropy_ignore_pad(logits, batch["y_out"], pad_id)

    def _step(state: TrainState, batch: Dict, rng: jax.Array, modality: Optional[str]) -> tuple:
        rng_c, rng_d = jax.random.split(rng)
        y_in = corrupt_tokens(rng_c, batch["y_in"], vocab_size, teacher_forcing_prob, pad_id)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, y_in, rng_d, modality)
        grads = _cast_tree(grads, jnp.float32)
        return state.apply_gradients(grads), loss

    if multimodal:
        return jax.jit(_step, static_argnums=(3,), donate_argnums=(0,))
    return jax.jit(functools.partial(_step, modality=None), donate_argnums=(0,))
