"""Checkpointing: orbax save/restore, multimodal->unimodal split, hparams.

Replaces Lightning's ModelCheckpoint/load_from_checkpoint
(reference train.py:115-128, model.py:82): checkpoints are orbax pytrees
(atomic writes, async-capable) storing params, optimizer state, step/epoch,
the monitored metric, and the model hyperparameters + vocabulary needed to
rebuild the model without the original CLI flags.

``split_multimodal_params`` is the TPU-native equivalent of the reference's
checkpoint-surgery script (split_multimodal_ckpt.py:8-110): with namespaced
param trees the split is a dictionary projection instead of key rewriting.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

HPARAMS_FILE = "hparams.json"


def _ckptr() -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def save_checkpoint(path: str, state: Any, hparams: Optional[Dict] = None) -> None:
    """Atomic save of a pytree `state` + JSON hparams sidecar."""
    path = os.path.abspath(path)
    ckptr = _ckptr()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    if hparams is not None:
        with open(os.path.join(path, HPARAMS_FILE), "w") as f:
            json.dump(hparams, f, indent=1, default=str)


def load_hparams(path: str) -> Dict:
    with open(os.path.join(os.path.abspath(path), HPARAMS_FILE)) as f:
        return json.load(f)


def restore_checkpoint(path: str, target: Any = None) -> Any:
    """Restore a pytree; `target` (same structure, e.g. from init) enables
    exact dtype/sharding restoration."""
    path = os.path.abspath(path)
    ckptr = _ckptr()
    if target is None:
        return ckptr.restore(path)
    return ckptr.restore(path, target=target)


def split_multimodal_params(params: Dict) -> Tuple[Dict, Dict]:
    """Multimodal param tree -> (image_model_params, audio_model_params).

    Each output is a valid UnimodalTransformer tree: the modality encoder is
    renamed to 'encoder', the shared decoder is copied, and cross_attn (if
    any) is dropped — semantics of reference split_multimodal_ckpt.py:43-70.
    """
    img = {"encoder": params["image_encoder"], "decoder": params["decoder"]}
    audio = {"encoder": params["audio_encoder"], "decoder": params["decoder"]}
    return jax.tree.map(lambda x: x, img), jax.tree.map(lambda x: x, audio)


def save_split_checkpoints(ckpt_path: str, out_prefix: Optional[str] = None) -> Tuple[str, str]:
    """Load a multimodal checkpoint and write two unimodal ones
    ('<ckpt>_only_image_distorted', '<ckpt>_only_audio' — reference naming)."""
    ckpt_path = os.path.abspath(ckpt_path.rstrip("/"))
    state = restore_checkpoint(ckpt_path)
    hp = load_hparams(ckpt_path)
    params = state["params"] if "params" in state else state
    img_params, audio_params = split_multimodal_params(params)

    def sub_hparams(modality: str) -> Dict:
        out = dict(hp)
        out.pop("mixer_type", None)
        out.pop("teacher_forcing_modality_prob", None)
        out["input_modality"] = modality
        return out

    prefix = out_prefix or ckpt_path
    img_path = prefix + "_only_image_distorted"
    audio_path = prefix + "_only_audio"
    save_checkpoint(img_path, {"params": img_params}, sub_hparams("image"))
    save_checkpoint(audio_path, {"params": audio_params}, sub_hparams("audio"))
    return img_path, audio_path
