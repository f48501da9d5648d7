"""Convert a reference PyTorch-Lightning .ckpt into an orbax checkpoint
loadable by our CLIs (the parity bridge for reference-trained weights)."""

from __future__ import annotations

import argparse

import numpy as np

from omr_a2s_multimodal_transformer_tpu.training.checkpoint import save_checkpoint
from omr_a2s_multimodal_transformer_tpu.training.torch_import import (
    convert_multimodal_state_dict,
    convert_unimodal_state_dict,
    load_torch_checkpoint,
)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch_ckpt", required=True, help="reference .ckpt path")
    p.add_argument("--out", required=True, help="output orbax checkpoint dir")
    p.add_argument("--vocab_size", type=int, default=None,
                   help="override (else inferred from embedding shape)")
    args = p.parse_args(argv)

    sd, hp = load_torch_checkpoint(args.torch_ckpt)
    multimodal = any(k.startswith("image_encoder.") for k in sd)
    params = convert_multimodal_state_dict(sd) if multimodal else convert_unimodal_state_dict(sd)

    vocab_size = args.vocab_size or int(np.asarray(params["decoder"]["embedding"]).shape[0])
    out_hp = {
        "vocab_size": vocab_size,
        "max_seq_len": int(hp.get("max_seq_len", 1268)),
        "input_modality": "both" if multimodal else hp.get("input_modality", "image"),
        "mixer_type": hp.get("mixer_type"),
        "attn_window": int(hp.get("attn_window", -1)),
        "imported_from": args.torch_ckpt,
    }
    save_checkpoint(args.out, {"params": params}, hparams=out_hp)
    print(f"Imported {'multimodal' if multimodal else 'unimodal'} checkpoint -> {args.out}")
    print(f"hparams: {out_hp}")


if __name__ == "__main__":
    main()
