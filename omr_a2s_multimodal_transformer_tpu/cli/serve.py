"""Serving daemon CLI: load a checkpoint and serve transcription over HTTP.

The reference has no serving entry point; this wraps the dynamic-batching
server (serving.py) around the jitted end-to-end transcribers.

Example:
  python -m omr_a2s_multimodal_transformer_tpu.cli.serve \
    --checkpoint_path weights/grandstaff/image_kern/best \
    --vocab_path grandstaff/vocabs/ar_w2i_kern.json \
    --image_height 368 --image_widths 1104,2208,4416 --port 8787
"""

from __future__ import annotations

import argparse
import time

from omr_a2s_multimodal_transformer_tpu.cli import common
from omr_a2s_multimodal_transformer_tpu.data.vocab import Vocabulary
from omr_a2s_multimodal_transformer_tpu.serving import TranscriptionServer, serve_http


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint_path", required=True, help="orbax checkpoint dir")
    p.add_argument("--audio_checkpoint_path", default="",
                   help="serve weighted late fusion: --checkpoint_path is the image "
                        "model, this the audio model; requests are (image, wave) pairs "
                        "(HTTP: .npz with arrays 'image' and 'wave')")
    p.add_argument("--alpha", type=float, default=0.5,
                   help="fusion mix weight: alpha*softmax(img) + (1-alpha)*softmax(audio); "
                        "0.5 is the grid-measured best (STATUS r4)")
    p.add_argument("--vocab_path", required=True, help="vocabs/ar_w2i_<enc>.json")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--image_height", type=int, default=368,
                   help="padded canvas height (image modality)")
    p.add_argument("--image_widths", default="1104,2208,4416",
                   help="comma-separated width bucket ladder (image modality)")
    p.add_argument("--audio_seconds", default="5,10,19",
                   help="comma-separated waveform bucket ladder in seconds @22.05kHz (audio)")
    p.add_argument("--img_height", type=int, default=None,
                   help="on-device aspect-preserving resize target (reference img_height flag)")
    p.add_argument("--cache_dtype", default=None, choices=["float32", "bfloat16", "int8", "int4"])
    p.add_argument("--packed_stem", choices=["on", "off"], default=None,
                   help="override the checkpoint's lane-packed-stem setting (numerics-equivalent)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--threefry_prng", action="store_true")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    common.init_cli(args)
    model, params, hp, multimodal = common.build_from_checkpoint(
        args.checkpoint_path, hparams_override={
            "cache_dtype": args.cache_dtype,
            "packed_stem": None if args.packed_stem is None else args.packed_stem == "on",
        }
    )
    modality = hp.get("input_modality", "image")
    if multimodal or modality == "both":
        raise SystemExit("serving supports unimodal checkpoints; split the multimodal "
                         "checkpoint first (cli.split_ckpt)")
    vocab = Vocabulary.load(args.vocab_path)
    kw = {}
    if args.audio_checkpoint_path:
        if modality != "image":
            raise SystemExit("fused serving: --checkpoint_path must be the IMAGE model "
                             f"(got input_modality={modality!r})")
        audio_model, audio_params, ahp, amulti = common.build_from_checkpoint(
            args.audio_checkpoint_path, hparams_override={"cache_dtype": args.cache_dtype})
        if amulti or ahp.get("input_modality") != "audio":
            raise SystemExit("fused serving: --audio_checkpoint_path must be a unimodal "
                             "audio checkpoint")
        modality = "fused"
        kw.update(audio_model=audio_model, audio_params={"params": audio_params},
                  alpha=args.alpha)
    if modality in ("image", "fused"):
        kw["image_height"] = args.image_height
        kw["image_widths"] = [int(w) for w in args.image_widths.split(",")]
        kw["img_height"] = args.img_height
    if modality in ("audio", "fused"):
        kw["audio_samples"] = [int(float(s) * 22050) for s in args.audio_seconds.split(",")]
    server = TranscriptionServer(
        model, {"params": params}, modality, vocab=vocab,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms, **kw,
    )
    httpd = serve_http(server, host=args.host, port=args.port)
    print(f"serving {modality} checkpoint {args.checkpoint_path} "
          f"on http://{args.host}:{httpd.server_address[1]} "
          f"(POST /transcribe with a raw .npy body; GET /healthz)")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        server.stop()


if __name__ == "__main__":
    main()
