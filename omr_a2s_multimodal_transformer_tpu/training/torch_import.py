"""PyTorch checkpoint importer: reference Lightning state_dicts -> our trees.

Converts a reference checkpoint's ``state_dict`` (torch tensors, NCHW/OIHW,
packed qkv projections) into the flax param tree of
UnimodalTransformer/MultimodalTransformer. This is the parity bridge: the
BASELINE north star requires SER parity against PyTorch checkpoints, which
is only testable if their weights load here.

Key mappings (reference module paths from encoder.py / decoder.py / model.py):
  encoder.conv_blocks.{i}.conv{j}       -> encoder/block{i}/conv{j}        (OIHW->HWIO)
  encoder.dscblocks.{i}.conv{j}.{depth_conv,point_conv}
                                        -> encoder/dsc{i}/conv{j}/...
  decoder.embedding.weight              -> decoder/embedding
  decoder.transformer_decoder.layers.{i}.self_attn.in_proj_*  (packed qkv)
                                        -> decoder/layer{i}/self_attn/{q,k,v}_proj
  ...multihead_attn.*                   -> decoder/layer{i}/cross_attn/*
  ...linear{1,2}, norm{1,2,3}           -> decoder/layer{i}/...
  decoder.out_layer (Conv1d k=1)        -> decoder/out_layer (Dense)
  {image,audio}_encoder.*, {image,audio}_pos_2d (buffers, skipped),
  cross_attn.attention.*                -> cross_attn/mha/*
Positional-encoding buffers (pe) are recomputed, not imported.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _p(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def _np(t) -> np.ndarray:
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _conv2d(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0),  # OIHW -> HWIO
        "bias": _np(sd[prefix + ".bias"]),
    }


def _dsconv(sd: Dict, prefix: str) -> Dict[str, Dict[str, np.ndarray]]:
    return {
        "depth_conv": _conv2d(sd, prefix + ".depth_conv"),
        "point_conv": _conv2d(sd, prefix + ".point_conv"),
    }


def _dense(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd[prefix + ".weight"]).T, "bias": _np(sd[prefix + ".bias"])}


def _layernorm(sd: Dict, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def _mha(sd: Dict, prefix: str) -> Dict[str, Dict[str, np.ndarray]]:
    """torch nn.MultiheadAttention (packed in_proj) -> q/k/v/out projections."""
    w = _np(sd[prefix + ".in_proj_weight"])  # [3D, D]
    b = _np(sd[prefix + ".in_proj_bias"])  # [3D]
    d = w.shape[1]
    qw, kw, vw = w[:d], w[d : 2 * d], w[2 * d :]
    qb, kb, vb = b[:d], b[d : 2 * d], b[2 * d :]
    return {
        "q_proj": {"kernel": qw.T, "bias": qb},
        "k_proj": {"kernel": kw.T, "bias": kb},
        "v_proj": {"kernel": vw.T, "bias": vb},
        "out_proj": _dense(sd, prefix + ".out_proj"),
    }


def convert_encoder(sd: Dict, prefix: str = "encoder") -> Dict:
    out: Dict = {}
    for i in range(5):
        out[f"block{i}"] = {
            f"conv{j}": _conv2d(sd, _p(prefix, f"conv_blocks.{i}.conv{j}")) for j in (1, 2, 3)
        }
    for i in range(4):
        out[f"dsc{i}"] = {
            f"conv{j}": _dsconv(sd, _p(prefix, f"dscblocks.{i}.conv{j}")) for j in (1, 2, 3)
        }
    return out


def convert_decoder(sd: Dict, prefix: str = "decoder", n_layers: int = 8) -> Dict:
    out: Dict = {"embedding": _np(sd[_p(prefix, "embedding.weight")])}
    for i in range(n_layers):
        lp = _p(prefix, f"transformer_decoder.layers.{i}")
        out[f"layer{i}"] = {
            "self_attn": _mha(sd, lp + ".self_attn"),
            "cross_attn": _mha(sd, lp + ".multihead_attn"),
            "linear1": _dense(sd, lp + ".linear1"),
            "linear2": _dense(sd, lp + ".linear2"),
            "norm1": _layernorm(sd, lp + ".norm1"),
            "norm2": _layernorm(sd, lp + ".norm2"),
            "norm3": _layernorm(sd, lp + ".norm3"),
        }
    # Conv1d [V, D, 1] -> Dense [D, V]
    out["out_layer"] = {
        "kernel": _np(sd[_p(prefix, "out_layer.weight")])[:, :, 0].T,
        "bias": _np(sd[_p(prefix, "out_layer.bias")]),
    }
    return out


def convert_unimodal_state_dict(sd: Dict) -> Dict:
    """Reference ``Transformer`` state_dict -> UnimodalTransformer params."""
    return {"encoder": convert_encoder(sd, "encoder"), "decoder": convert_decoder(sd, "decoder")}


def convert_multimodal_state_dict(sd: Dict) -> Dict:
    """Reference ``MultimodalTransformer`` state_dict -> params tree."""
    out = {
        "image_encoder": convert_encoder(sd, "image_encoder"),
        "audio_encoder": convert_encoder(sd, "audio_encoder"),
        "decoder": convert_decoder(sd, "decoder"),
    }
    if any(k.startswith("cross_attn.") for k in sd):
        out["cross_attn"] = {"mha": _mha(sd, "cross_attn.attention")}
    return out


def load_torch_checkpoint(path: str) -> Dict:
    """Load a Lightning .ckpt (CPU) and return (state_dict, hyper_parameters)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt["state_dict"], ckpt.get("hyper_parameters", {})
