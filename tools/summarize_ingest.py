"""Summarize the reference-scale streaming-ingest run (VERDICT r4 #5)
into one report: per-epoch samples/s of the 25,691-sample grain-loader
training run (no device cache) vs the device-cache path's rate, plus the
loader-only throughput from tools/bench_ingest.py if available.

Usage: python tools/summarize_ingest.py [--run_dir runs/ingest_25k/runs]
       [--ingest_log /tmp/bench_ingest_25k.log]
       [--out reports/ingest_25k_r05.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", default="runs/ingest_25k/runs")
    ap.add_argument("--ingest_log", default="/tmp/bench_ingest_25k.log")
    ap.add_argument("--device_cache_samples_per_sec", type=float, default=36.0,
                    help="measured steady-state train samples/s of the same "
                         "recipe with the on-device input cache (grid image "
                         "legs this round: 36.0 zero-reg / 31.4 with dropout)")
    ap.add_argument("--out", default="reports/ingest_25k_r05.json")
    args = ap.parse_args()

    rows = []
    mpath = os.path.join(args.run_dir, "metrics.jsonl")
    if os.path.exists(mpath):
        rows = [json.loads(ln) for ln in open(mpath) if ln.strip()]
    epochs = [r for r in rows if "samples_per_sec" in r]
    loader_lines = []
    if os.path.exists(args.ingest_log):
        for ln in open(args.ingest_log):
            ln = ln.strip()
            if ln.startswith("{"):
                try:
                    loader_lines.append(json.loads(ln))
                except Exception:
                    pass

    report = {
        "corpus": {"train_n": 25691, "geometry": "production varied 2-30 measures, "
                   "grand render, b8 image 361x4416 max", "device_cache": False,
                   "loader": "grain multiprocess, 8 workers, 1-CPU host"},
        "train_epochs": [
            {k: round(float(r[k]), 4) if isinstance(r[k], (int, float)) else r[k]
             for k in ("epoch", "train_loss", "samples_per_sec",
                       "time_data_total_s", "time_step_total_s") if k in r}
            for r in epochs
        ],
        "streaming_samples_per_sec": (round(float(epochs[-1]["samples_per_sec"]), 2)
                                      if epochs else None),
        "device_cache_samples_per_sec": args.device_cache_samples_per_sec,
        "loader_only": loader_lines,
    }
    if epochs:
        s = report["streaming_samples_per_sec"]
        report["streaming_vs_device_cache_pct"] = round(
            100.0 * s / args.device_cache_samples_per_sec, 1)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "train_epochs"}, indent=1))
    print("->", args.out)


if __name__ == "__main__":
    main()
