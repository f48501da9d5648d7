"""Streaming-loader feed rate at reference scale (25,691-sample corpus,
production geometry, warm frontend cache, NO device cache) — the rate the
data layer can feed a train step that consumes 31-36 samples/s.

Uses the exact CLI datamodule construction (verified cache-hit against
the prerendered corpus: 0 new entries on access).

Usage: python tools/measure_stream_rate.py [--seconds 90] [--backends threads grain]
"""
import argparse, json, sys, time
sys.path.insert(0, ".")
from tools.run_convergence import synth_cfg

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=90)
    ap.add_argument("--train_n", type=int, default=25691)
    ap.add_argument("--backends", nargs="+", default=["threads", "grain"])
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="reports/stream_rate_25k_r05.json")
    args = ap.parse_args()
    cfg = json.loads(synth_cfg(args.train_n, 128, False, 30, "grand",
                               measures_range=[2, 30], audio_style="bands"))
    from omr_a2s_multimodal_transformer_tpu.data.dataset import ARDataModule
    out = {"train_n": args.train_n, "batch": args.batch, "workers": args.workers,
           "seconds_per_backend": args.seconds, "rates": {}}
    for backend in args.backends:
        dm = ARDataModule(ds_name="synthetic", krn_encoding="kern",
                          input_modality="image", batch_size=args.batch,
                          num_workers=args.workers, synthetic=True,
                          synthetic_kwargs=cfg, cache_root="/tmp/probe_cache",
                          use_distorted_images=True, loader_backend=backend)
        dm.setup("fit")
        n, t0 = 0, time.perf_counter()
        try:
            for b in dm.train_dataloader():
                n += next(iter(b.values())).shape[0]
                if time.perf_counter() - t0 > args.seconds:
                    break
        except Exception as e:  # a backend that wedges/crashes is a result too
            out["rates"][backend] = {"error": repr(e)[:200], "samples": n}
            continue
        dt = time.perf_counter() - t0
        out["rates"][backend] = {"samples": n, "wall_s": round(dt, 1),
                                 "samples_per_sec": round(n / dt, 2)}
        print(backend, out["rates"][backend], flush=True)
    json.dump(out, open(args.out, "w"), indent=1)
    print("->", args.out)

if __name__ == "__main__":
    main()
