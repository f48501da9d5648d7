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


def stitch_multimodal_params(
    mm_params: Dict,
    img_params: Optional[Dict] = None,
    audio_params: Optional[Dict] = None,
    decoder_from: str = "image",
) -> Dict:
    """Inverse of ``split_multimodal_params``: warm-start a multimodal tree
    from trained unimodal checkpoints.

    ``image_encoder``/``audio_encoder`` are overwritten from the respective
    unimodal trees' ``encoder``; the shared ``decoder`` comes from the leg
    named by ``decoder_from``. Mixer-only params (``cross_attn``) keep their
    fresh initialization — the reference trains multimodal models from
    scratch (run_experiments.sh:40-61); this is an addition that shortcuts
    the attention mixers' cross-modal alignment latch (see STATUS r4: attn
    mixers plateau at the no-latch basin for 60 epochs from scratch).

    Shapes are validated leaf-by-leaf; a unimodal checkpoint with a
    different geometry fails loudly instead of training from a silently
    mis-stitched tree.
    """
    if decoder_from not in ("image", "audio"):
        raise ValueError(f"decoder_from must be 'image' or 'audio', got {decoder_from!r}")
    out = dict(mm_params)

    def _take(dst_key: str, src_tree: Dict, src_key: str, src_name: str) -> None:
        ref = mm_params[dst_key]
        new = src_tree[src_key]
        if jax.tree.structure(ref) != jax.tree.structure(new):
            raise ValueError(
                f"stitch: {src_name}[{src_key!r}] tree structure does not match "
                f"multimodal[{dst_key!r}]")
        for p_ref, p_new in zip(jax.tree.leaves(ref), jax.tree.leaves(new)):
            if p_ref.shape != p_new.shape:
                raise ValueError(
                    f"stitch: shape mismatch in {dst_key}: {p_ref.shape} vs {p_new.shape}")
        out[dst_key] = jax.tree.map(lambda x: x, new)

    if img_params is not None:
        _take("image_encoder", img_params, "encoder", "image ckpt")
    if audio_params is not None:
        _take("audio_encoder", audio_params, "encoder", "audio ckpt")
    dec_src = img_params if decoder_from == "image" else audio_params
    if dec_src is not None:
        _take("decoder", dec_src, "decoder", f"{decoder_from} ckpt")
    return out


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
