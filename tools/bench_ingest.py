"""Ingest-throughput bench (VERDICT r1 weak #8): cold- and warm-cache
data-loading samples/s for both loader backends (GIL-bound thread pool vs
grain multiprocess), at real GRANDSTAFF image shapes, compared against the
train-step consumption rate.

The host frontends (PIL image normalize + numpy log-STFT + tokenizer) run
behind a joblib disk cache (data/frontends.py); after epoch 1 the loader
mostly does disk reads + static-shape collate. What matters for TPU feed:
  cold samples/s  >= train-step samples/s  (else epoch 1 is host-bound)
  warm samples/s  >> train-step samples/s  (steady state)

Usage: python tools/bench_ingest.py [--n 64] [--batch 4] [--modality image]
Emits one JSON line per (backend, cache-state).
"""

import argparse
import json
import shutil
import sys
import time

sys.path.insert(0, ".")


def make_dm(backend: str, n: int, batch: int, modality: str, workers: int, cache_root: str,
            measures_range=None, audio_style: str = "tones"):
    from omr_a2s_multimodal_transformer_tpu.data.dataset import ARDataModule

    kwargs = {
        "n": n,
        "n_measures": 30,
        "img_height_range": [355, 362],
        "img_width_range": [4300, 4413],
        "audio_seconds_range": [17.0, 18.7],
        "render_style": "grand",
    }
    if measures_range:
        kwargs["n_measures_range"] = list(measures_range)
    if audio_style != "tones":
        kwargs["audio_style"] = audio_style
    return ARDataModule(
        ds_name="synthetic",
        krn_encoding="kern",
        input_modality=modality,
        batch_size=batch,
        num_workers=workers,
        synthetic=True,
        synthetic_kwargs=kwargs,
        cache_root=cache_root,
        loader_backend=backend,
    )


def time_epoch(loader) -> float:
    t0 = time.perf_counter()
    n = 0
    for batch in loader:
        first = next(iter(batch.values()))
        n += first.shape[0]
    return n / (time.perf_counter() - t0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--modality", default="image", choices=["image", "audio", "both"])
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--backends", default="threads,grain")
    p.add_argument("--measures_range", nargs=2, type=int, default=None)
    p.add_argument("--audio_style", default="tones", choices=["tones", "bands"])
    p.add_argument("--keep_cache", action="store_true",
                   help="do NOT wipe the shared joblib frontend cache first — "
                        "measures warm-cache (steady-state) throughput only; "
                        "REQUIRED when a prerendered corpus must survive")
    args = p.parse_args()

    from omr_a2s_multimodal_transformer_tpu.data import frontends

    for backend in args.backends.split(","):
        # Fresh preprocess cache per backend -> honest cold numbers
        # (skipped with --keep_cache: cold == warm then).
        if frontends.MEMORY is not None and not args.keep_cache:
            frontends.MEMORY.clear(warn=False)
        cache_root = f"/tmp/ingest_cache_{backend}"
        shutil.rmtree(cache_root, ignore_errors=True)
        try:
            dm = make_dm(backend, args.n, args.batch, args.modality, args.workers, cache_root,
                         args.measures_range, args.audio_style)
            dm.setup("fit")
            cold = time_epoch(dm.train_dataloader())
            warm = time_epoch(dm.train_dataloader())
            print(json.dumps({
                "metric": f"ingest_{backend}",
                "modality": args.modality,
                "cold_samples_per_sec": round(cold, 2),
                "warm_samples_per_sec": round(warm, 2),
                "n": args.n, "batch": args.batch, "workers": args.workers,
            }))
        except ImportError as e:
            print(json.dumps({"metric": f"ingest_{backend}", "skipped": str(e)}))


if __name__ == "__main__":
    main()
