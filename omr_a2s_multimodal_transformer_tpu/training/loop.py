"""Training runtime: the Lightning-Trainer equivalent, as an explicit JAX loop.

Responsibilities (reference train.py:115-158): epoch loop, validation every
N epochs via greedy decode + SER/seq-ER, best-checkpoint tracking on
val_sym-er (min), early stopping (min_delta 0.01), resume, final test of the
best weights, metric logging. TPU-first: jitted bf16 train step with donated
state, batched KV-cached eval decode, optional (data, model) mesh sharding.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from omr_a2s_multimodal_transformer_tpu.data.vocab import Vocabulary
from omr_a2s_multimodal_transformer_tpu.parallel import mesh as mesh_lib
from omr_a2s_multimodal_transformer_tpu.training import checkpoint as ckpt_lib
from omr_a2s_multimodal_transformer_tpu.training.corruption import draw_modality
from omr_a2s_multimodal_transformer_tpu.training.decode import cut_at_eos, greedy_decode_fn
from omr_a2s_multimodal_transformer_tpu.training.train_state import TrainState, adam, make_train_step
from omr_a2s_multimodal_transformer_tpu.utils.logging import MetricsLogger
from omr_a2s_multimodal_transformer_tpu.utils.metrics import compute_metrics
from omr_a2s_multimodal_transformer_tpu.utils.profiling import StepTimer, trace


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


class Trainer:
    def __init__(
        self,
        model,
        vocab: Vocabulary,
        hparams: Dict,
        weights_dir: str,
        run_dir: str = "runs/default",
        epochs: int = 1000,
        patience: int = 20,
        min_delta: float = 0.01,
        check_val_every_n_epoch: int = 5,
        learning_rate: float = 1e-4,
        warmup_steps: int = 0,
        decay_steps: int = 0,
        clip_norm: float = 0.0,  # >0: global-norm gradient clipping (post-LN spike guard)
        train_only=None,  # e.g. ("cross_attn", "mix_gate"): freeze all other param groups
        teacher_forcing_prob: float = 0.2,
        teacher_forcing_modality_prob: float = 0.2,
        bf16_compute: bool = True,
        multimodal: bool = False,
        mesh=None,
        use_wandb: bool = False,
        wandb_group: Optional[str] = None,
        wandb_name: Optional[str] = None,
        seed: int = 42,
        ytest_i2w: Optional[Dict[int, str]] = None,
        compute_mv2h: bool = False,
        profile_first_epoch: bool = False,
        beam_size: int = 1,  # >1: beam search at eval (TPU extra; reference is greedy-only)
        length_penalty: float = 0.0,  # GNMT length penalty for beam search
        device_cache: bool = False,  # pin the train corpus in HBM (data/device_cache.py)
        device_cache_u8: bool = False,  # uint8 image residency (2x corpus per GB, bit-exact)
    ):
        self.model = model
        self.vocab = vocab
        self.hparams = hparams
        self.weights_dir = weights_dir
        self.epochs = epochs
        self.patience = patience
        self.min_delta = min_delta
        self.check_every = check_val_every_n_epoch
        self.multimodal = multimodal
        self.tf_modality_prob = teacher_forcing_modality_prob
        self.mesh = mesh
        self.seed = seed
        self.compute_mv2h = compute_mv2h
        self.ytest_i2w = ytest_i2w  # cross-domain eval: GT decoded in test vocab
        self.profile_first_epoch = profile_first_epoch
        self.beam_size = beam_size
        self.length_penalty = length_penalty
        self.device_cache = device_cache
        self.device_cache_u8 = device_cache_u8
        self.logger = MetricsLogger(
            run_dir, use_wandb=use_wandb, wandb_group=wandb_group, wandb_name=wandb_name, config=hparams
        )
        self.tx = adam(learning_rate, warmup_steps=warmup_steps, decay_steps=decay_steps,
                       clip_norm=clip_norm, train_only=train_only)
        self.train_step = make_train_step(
            model, vocab_size=len(vocab),
            teacher_forcing_prob=teacher_forcing_prob,
            bf16_compute=bf16_compute, multimodal=multimodal,
        )
        self.bf16_compute = bf16_compute
        self._decode = None
        self.state: Optional[TrainState] = None

    # ------------------------------------------------------------------ setup
    def init_state(self, sample_batch: Dict) -> TrainState:
        rng = jax.random.PRNGKey(self.seed)
        if self.multimodal:
            variables = jax.jit(self.model.init)(
                {"params": rng},
                jnp.asarray(sample_batch["xi"]), jnp.asarray(sample_batch["xi_hw"]),
                jnp.asarray(sample_batch["xa"]), jnp.asarray(sample_batch["xa_hw"]),
                jnp.asarray(sample_batch["y_in"]),
            )
        else:
            variables = jax.jit(self.model.init)(
                {"params": rng},
                jnp.asarray(sample_batch["x"]), jnp.asarray(sample_batch["x_hw"]),
                jnp.asarray(sample_batch["y_in"]),
            )
        params = variables["params"]
        if self.mesh is not None:
            shardings = mesh_lib.param_shardings(params, self.mesh)
            params = jax.tree.map(jax.device_put, params, shardings)
        self.state = TrainState.create(params, self.tx)
        # model summary (the reference prints torchinfo tables at init)
        n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
        per_top = {k: sum(int(np.prod(x.shape)) for x in jax.tree.leaves(v)) for k, v in params.items()}
        self.logger.log({"trainable_params": n_params, **{f"params_{k}": v for k, v in per_top.items()}},
                        step=0, quiet=False)
        return self.state

    def _reshard(self, tree):
        """Re-apply mesh placement to a restored tree: params (and the
        optimizer-moment subtrees, which mirror the param treedef) get their
        TP/replicated shardings back. Checkpoint restore materializes plain
        host arrays; without this, a resumed run under a mesh would silently
        continue on one device."""
        if self.mesh is None:
            return tree
        params_def = jax.tree.structure(self.state.params)
        shardings = mesh_lib.param_shardings(self.state.params, self.mesh)

        def matches(sub) -> bool:
            try:
                return jax.tree.structure(sub) == params_def
            except Exception:
                return False

        if matches(tree):  # the params tree itself
            return jax.tree.map(jax.device_put, tree, shardings)
        return jax.tree.map(  # opt_state: shard the param-shaped moment subtrees
            lambda sub: jax.tree.map(jax.device_put, sub, shardings) if matches(sub) else sub,
            tree, is_leaf=matches,
        )

    def restore(self, path: str) -> None:
        """Restore params (+ optimizer state and step when present and
        structurally compatible — full resume semantics)."""
        if self.state is not None:
            target = {
                "params": jax.tree.map(np.asarray, self.state.params),
                "opt_state": jax.tree.map(np.asarray, self.state.opt_state),
                "step": 0,
            }
            try:  # full resume with structure-preserving restore
                restored = ckpt_lib.restore_checkpoint(path, target=target)
                self.state = self.state.replace(
                    params=self._reshard(jax.tree.map(jnp.asarray, restored["params"])),
                    opt_state=self._reshard(jax.tree.map(jnp.asarray, restored["opt_state"])),
                    step=jnp.int32(restored["step"]),
                )
                return
            except Exception as e:
                # LOUD fallback: silently resetting Adam moments mid-run after
                # a structural mismatch (e.g. an optimizer/model refactor)
                # would corrupt a resumed training trajectory undetected.
                msg = (
                    f"full resume from {path} failed ({type(e).__name__}: {e}); "
                    "falling back to PARAMS-ONLY restore — optimizer state and "
                    "step counter are reset"
                )
                logging.getLogger(__name__).warning(msg)
                if self.logger is not None:
                    self.logger.log({"resume_degraded": msg}, step=0)
        restored = ckpt_lib.restore_checkpoint(path)
        params = restored["params"] if "params" in restored else restored
        params = jax.tree.map(jnp.asarray, params)
        if self.state is None:
            if self.mesh is not None:
                shardings = mesh_lib.param_shardings(params, self.mesh)
                params = jax.tree.map(jax.device_put, params, shardings)
            self.state = TrainState.create(params, self.tx)
        else:
            self.state = self.state.replace(params=self._reshard(params))

    def warm_start_from_unimodal(
        self,
        image_ckpt: Optional[str] = None,
        audio_ckpt: Optional[str] = None,
        decoder_from: str = "image",
    ) -> None:
        """Overwrite the freshly-initialized multimodal encoders/decoder with
        trained unimodal checkpoints (ckpt_lib.stitch_multimodal_params);
        mixer params (cross_attn) keep their fresh init and the optimizer
        restarts from step 0. Call after init_state, before fit."""
        assert self.state is not None, "init_state first"
        assert self.multimodal, "warm start targets the multimodal model"

        def _load(path):
            if not path:
                return None
            restored = ckpt_lib.restore_checkpoint(path)
            params = restored["params"] if "params" in restored else restored
            return jax.tree.map(jnp.asarray, params)

        stitched = ckpt_lib.stitch_multimodal_params(
            self.state.params, _load(image_ckpt), _load(audio_ckpt), decoder_from)
        self.state = TrainState.create(self._reshard(stitched), self.tx)
        self.logger.log({"warm_start_image": image_ckpt or "", "warm_start_audio": audio_ckpt or "",
                         "warm_start_decoder_from": decoder_from}, step=0, quiet=False)

    # ------------------------------------------------------------------ train
    # f32 input tensors the bf16 train step downcasts on-device anyway;
    # casting them on the HOST first halves host->device bytes (the training
    # bottleneck behind a remote-TPU tunnel, and real PCIe staging on pods:
    # a b8 361x4416 f32 image batch is 170 MB/step). Numerics-identical for
    # training: f32->bf16 rounding is the same on either side of the wire.
    _BF16_SHIP_KEYS = ("x", "xi", "xa")

    def _put(self, batch: Dict, bf16_inputs: bool = False) -> Dict:
        arrays = {
            k: jnp.asarray(
                v.astype(jnp.bfloat16)
                if (bf16_inputs and k in self._BF16_SHIP_KEYS
                    and getattr(v, "dtype", None) == jnp.float32)
                else v
            )
            for k, v in batch.items()
        }
        if self.mesh is not None:
            arrays = mesh_lib.shard_batch(arrays, self.mesh)
        return arrays

    def _mesh_ctx(self):
        """Enter the mesh context so bare-PartitionSpec sharding constraints
        (sequence-parallel memory, parallel/mesh.py) resolve inside jit."""
        return self.mesh if self.mesh is not None else _nullcontext()

    def fit(self, datamodule, auto_resume: bool = True) -> Dict[str, float]:
        with self._mesh_ctx():
            return self._fit(datamodule, auto_resume)

    def _fit(self, datamodule, auto_resume: bool = True) -> Dict[str, float]:
        datamodule.setup("fit")
        train_loader = datamodule.train_dataloader()
        val_loader = datamodule.val_dataloader()
        if self.device_cache:
            if self.mesh is not None:
                # cached stacks are committed to one device; resharding them
                # per-step would defeat the point — keep the streaming loader
                logging.getLogger(__name__).warning(
                    "device_cache ignored under a mesh (streaming loader keeps "
                    "host->device sharding explicit)"
                )
            else:
                from omr_a2s_multimodal_transformer_tpu.data.device_cache import DeviceCacheLoader

                train_loader = DeviceCacheLoader(
                    train_loader, cast_bf16=self.bf16_compute, store_u8=self.device_cache_u8
                )
        start_epoch = 1
        best = float("inf")
        best_epoch = -1
        if self.state is None:
            sample = next(iter(train_loader))
            self.init_state(sample)
            last = os.path.join(self.weights_dir, "last")
            if auto_resume and os.path.exists(last):
                # crash/restart recovery: resume the latest full state AND
                # the epoch/best-metric bookkeeping from the hparams sidecars
                # (otherwise a resumed run restarts epoch numbering at 1 —
                # retraining self.epochs MORE epochs — and best=inf lets the
                # first post-resume val overwrite a better pre-crash 'best').
                self.restore(last)
                meta = ckpt_lib.load_hparams(last)
                start_epoch = int(meta.get("epoch", 0)) + 1
                best_path = os.path.join(self.weights_dir, "best")
                if os.path.exists(best_path):
                    bmeta = ckpt_lib.load_hparams(best_path)
                    if "val_sym-er" in bmeta:
                        best = float(bmeta["val_sym-er"])
                        best_epoch = int(bmeta.get("epoch", -1))
                self.logger.log(
                    {"resumed_from": last, "resumed_step": int(self.state.step),
                     "resumed_epoch": start_epoch - 1, "resumed_best": best},
                    step=int(self.state.step),
                )

        host_rng = np.random.default_rng(self.seed)
        rng = jax.random.PRNGKey(self.seed + 1)
        bad_checks = 0
        step = int(self.state.step)
        timer = StepTimer()

        for epoch in range(start_epoch, self.epochs + 1):
            t0 = time.time()
            losses = []
            it = iter(train_loader)
            ctx = (
                trace(self.logger.path + "_trace")
                if (self.profile_first_epoch and epoch == 1)
                else _nullcontext()
            )
            with ctx:
                while True:
                    with timer.phase("data"):
                        batch = next(it, None)
                    if batch is None:
                        break
                    rng, sub = jax.random.split(rng)
                    with timer.phase("step"):
                        b = self._put(batch, bf16_inputs=self.bf16_compute)
                        if self.multimodal:
                            modality = draw_modality(host_rng, self.tf_modality_prob)
                            self.state, loss = self.train_step(self.state, b, sub, modality)
                        else:
                            self.state, loss = self.train_step(self.state, b, sub)
                    losses.append(loss)
                    step += 1
            train_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
            dt = time.time() - t0
            n_samples = len(losses) * train_loader.batch_size
            self.logger.log(
                {"epoch": epoch, "train_loss": train_loss,
                 "samples_per_sec": n_samples / max(dt, 1e-9), **timer.summary()},
                step=step,
            )

            if epoch % self.check_every == 0:
                metrics = self.evaluate(val_loader, name="val")
                self.logger.log({"epoch": epoch, **metrics}, step=step)
                score = metrics["val_sym-er"]
                self.save(tag="last", extra={"val_sym-er": score, "epoch": epoch})
                if score < best - self.min_delta:
                    best, best_epoch, bad_checks = score, epoch, 0
                    self.save(tag="best", extra={"val_sym-er": score, "epoch": epoch})
                else:
                    bad_checks += 1
                    if bad_checks >= self.patience:
                        self.logger.log({"early_stop_epoch": epoch, "best_val_sym-er": best}, step=step)
                        break

        # reload best weights (reference train.py:156-158)
        best_path = os.path.join(self.weights_dir, "best")
        if os.path.exists(best_path):
            self.restore(best_path)
        return {"best_val_sym-er": best, "best_epoch": best_epoch}

    # ------------------------------------------------------------------- eval
    def _get_decode(self):
        if self._decode is None:
            if self.beam_size > 1:
                from omr_a2s_multimodal_transformer_tpu.training.decode import beam_decode_fn

                self._decode = jax.jit(
                    beam_decode_fn(
                        self.model, max_len=self.model.max_seq_len,
                        sos_id=self.vocab.sos_id, eos_id=self.vocab.eos_id,
                        beam_size=self.beam_size, multimodal=self.multimodal,
                        length_penalty=self.length_penalty,
                    )
                )
            else:
                self._decode = jax.jit(
                    greedy_decode_fn(
                        self.model,
                        max_len=self.model.max_seq_len,
                        sos_id=self.vocab.sos_id,
                        eos_id=self.vocab.eos_id,
                        multimodal=self.multimodal,
                    )
                )
        return self._decode

    def evaluate(self, loader, name: str = "val", gt_i2w: Optional[Dict[int, str]] = None,
                 save_preds: Optional[str] = None) -> Dict[str, float]:
        with self._mesh_ctx():
            return self._evaluate(loader, name, gt_i2w, save_preds)

    def _evaluate(self, loader, name: str = "val", gt_i2w: Optional[Dict[int, str]] = None,
                  save_preds: Optional[str] = None) -> Dict[str, float]:
        decode = self._get_decode()
        i2w = self.vocab.i2w
        gt_i2w = gt_i2w or (self.ytest_i2w if name == "test" and self.ytest_i2w else i2w)
        eos = self.vocab.eos_id
        y_true, y_pred = [], []
        variables = {"params": self.state.params}
        # Keep decode outputs on device while the loop streams batches; one
        # bulk transfer at the end so host metrics never stall the chip.
        pending = []
        for batch in loader:
            b = self._put(batch)
            if self.multimodal:
                tokens, _ = decode(variables, b["xi"], b["xi_hw"], b["xa"], b["xa_hw"])
            else:
                tokens, _ = decode(variables, b["x"], b["x_hw"])
            pending.append((tokens, batch["y_out"]))
        for tokens, y_out in pending:
            tokens = jax.device_get(tokens)
            pred_ids, _ = cut_at_eos(tokens, tokens, eos)
            gt_ids, _ = cut_at_eos(y_out, y_out, eos)
            # GT rows are padded with 0s; strip pads when no eos was found
            for p_row, g_row in zip(pred_ids, gt_ids):
                g_row = [g for g in g_row if g != 0]
                y_pred.append([i2w[i] for i in p_row])
                y_true.append([gt_i2w[i] for i in g_row])
        metrics = compute_metrics(y_true, y_pred, compute_mv2h=self.compute_mv2h)
        if save_preds:
            os.makedirs(os.path.dirname(save_preds) or ".", exist_ok=True)
            with open(save_preds, "w") as f:
                for g, p in zip(y_true, y_pred):
                    f.write(json.dumps({"y_true": g, "y_pred": p}) + "\n")
        return {f"{name}_{k}": v for k, v in metrics.items()}

    def test(self, datamodule, save_preds: Optional[str] = None) -> Dict[str, float]:
        datamodule.setup("test")
        metrics = self.evaluate(datamodule.test_dataloader(), name="test", save_preds=save_preds)
        self.logger.log(metrics, step=int(self.state.step))
        return metrics

    # ------------------------------------------------------------------- ckpt
    def save(self, tag: str = "best", extra: Optional[Dict] = None) -> str:
        path = os.path.join(self.weights_dir, tag)
        hp = dict(self.hparams)
        if extra:
            hp.update(extra)
        state = {
            "params": jax.tree.map(np.asarray, self.state.params),
            "opt_state": jax.tree.map(np.asarray, self.state.opt_state),
            "step": int(self.state.step),
        }
        ckpt_lib.save_checkpoint(path, state, hparams=hp)
        return path
