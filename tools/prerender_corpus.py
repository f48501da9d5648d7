"""Pre-render a synthetic corpus' frontend caches on CPU.

Populates the shared joblib frontend cache (./joblib_cache) for every
sample of a synthetic config, so a later TPU training job with the same
config skips straight to training. Useful when the TPU is busy with a
prior run: rendering (PIL + additive synth + STFT) is pure host work.

Usage:
  python tools/prerender_corpus.py --train_n 4096 --eval_n 128 \
      --measures_range 2 30 [--render_style grand]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_convergence import synth_cfg  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_n", type=int, default=4096)
    p.add_argument("--eval_n", type=int, default=128)
    p.add_argument("--n_measures", type=int, default=30)
    p.add_argument("--measures_range", nargs=2, type=int, default=None)
    p.add_argument("--render_style", default="grand")
    p.add_argument("--audio_style", default="tones", choices=["tones", "bands"])
    p.add_argument("--img_height", type=int, default=361)
    p.add_argument("--splits", nargs="+", default=["train", "val", "test"])
    args = p.parse_args()

    cfg = json.loads(synth_cfg(args.train_n, args.eval_n, False, args.n_measures,
                               args.render_style, args.img_height, args.measures_range,
                               args.audio_style))
    from omr_a2s_multimodal_transformer_tpu.data.frontends import (
        preprocess_audio, preprocess_image)
    from omr_a2s_multimodal_transformer_tpu.data.sources import make_source

    for split in args.splits:
        src = make_source("synthetic", split, encoding="kern", synthetic=True,
                          synthetic_kwargs=dict(cfg))
        t0 = time.time()
        for i in range(len(src)):
            s = src[i]
            preprocess_image(s["image"], None)
            preprocess_audio(s["audio"]["array"], s["audio"]["sampling_rate"])
            if i % 100 == 0:
                el = time.time() - t0
                print(f"[{split}] {i + 1}/{len(src)} ({el:.0f}s, "
                      f"{(i + 1) / max(el, 1e-9):.2f}/s)", flush=True)
        print(f"[{split}] done: {len(src)} samples in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
