"""Real-shape end-to-end pipeline run on TPU (VERDICT r1 item 7).

Drives the FULL user-facing pipeline — cli.train (fit -> val every N ->
best checkpoint -> final test) -> cli.test -> cli.sw_test ->
cli.weighted_test — at the true GRANDSTAFF configuration the reference
trains (run_experiments.sh:13): vocab 6,997 (the real collection
vocabulary), max_seq_len 1,268, distorted-image canvas 361x4412, audio
195x808, attn_window 100. The container has no GRANDSTAFF access (zero
egress), so samples come from the synthetic corpus *generated at real
shapes* (images ~355-362 x 4300-4413 px, ~17-18.7 s audio, ~700-token
transcripts) while the vocabulary/max-lens caches are pre-seeded with the
reference collection's real metadata (grandstaff/vocabs + max_lens) —
every array the model sees has the real production shape.

Writes stage wall-times + the val SER trajectory to
runs/real_shape_e2e/report.json. Usage:
  python tools/run_real_shape_e2e.py [--epochs 6] [--train_n 48]
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

REF_VOCAB = "/root/reference/grandstaff/vocabs/ar_w2i_kern.json"
REAL_MAX_LENS = {
    "max_seq_len": 1268,
    "max_image_height": 361,
    "max_image_width": 4412,
    "max_audio_height": 195,
    "max_audio_width": 808,
}


SMOKE_MAX_LENS = {
    "max_seq_len": 64,
    "max_image_height": 48,
    "max_image_width": 160,
    "max_audio_height": 195,
    "max_audio_width": 48,
}


def seed_caches(cache_root: str, smoke: bool = False) -> None:
    os.makedirs(os.path.join(cache_root, "vocabs"), exist_ok=True)
    os.makedirs(os.path.join(cache_root, "max_lens"), exist_ok=True)
    # Real collection vocabulary (6,997 tokens incl <PAD>) — dataset
    # metadata shipped with the reference repo; the synthetic corpus'
    # tokens are a strict subset (verified: 0 missing).
    shutil.copy(REF_VOCAB, os.path.join(cache_root, "vocabs", "ar_w2i_kern.json"))
    for name in ("ar_w2i_kern.json", "ImgDist_ar_w2i_kern.json"):
        with open(os.path.join(cache_root, "max_lens", name), "w") as f:
            json.dump(SMOKE_MAX_LENS if smoke else REAL_MAX_LENS, f)


def synth_cfg(n: int, smoke: bool = False) -> str:
    if smoke:  # tiny shapes: CPU plumbing dry-run of the same 5-stage pipeline
        return json.dumps({
            "n": n, "n_measures": 2,
            "img_height_range": [40, 48], "img_width_range": [96, 160],
            "audio_seconds_range": [0.5, 1.0],
        })
    return json.dumps({
        "n": n,
        "n_measures": 30,
        "img_height_range": [355, 362],
        "img_width_range": [4300, 4413],
        "audio_seconds_range": [17.0, 18.7],
    })


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--check_val_every_n_epoch", type=int, default=2)
    p.add_argument("--train_n", type=int, default=48,
                   help="samples per split (the synthetic source uses the same n for all splits)")
    p.add_argument("--image_batch", type=int, default=8)  # lane-packed stem: b8 fits in <6 GB
    p.add_argument("--width_buckets", type=int, default=1,
                   help=">1: geometric width-bucket ladder (cuts padded-FLOP waste on narrow systems)")
    p.add_argument("--audio_batch", type=int, default=16)
    p.add_argument("--eval_batch", type=int, default=8)
    p.add_argument("--workdir", default="runs/real_shape_e2e")
    p.add_argument("--smoke", action="store_true",
                   help="tiny shapes (CPU plumbing dry-run, same 5 stages)")
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    cache_root = os.path.join(args.workdir, "grandstaff_cache")
    seed_caches(cache_root, smoke=args.smoke)

    common_flags = [
        "--ds_name", "synthetic",
        "--synthetic_config", synth_cfg(args.train_n, smoke=args.smoke),
        "--krn_encoding", "kern",
        "--use_distorted_images",
        "--cache_root", cache_root,
        "--eval_batch_size", str(args.eval_batch),
        "--num_workers", "8",
        "--width_buckets", str(args.width_buckets),
    ]
    report = {"stages": {}, "config": vars(args)}

    def stage(name, fn, *argv):
        print(f"\n=== STAGE {name} ===", flush=True)
        t0 = time.time()
        fn(list(argv))
        dt = time.time() - t0
        report["stages"][name] = {"wall_s": round(dt, 1)}
        print(f"=== STAGE {name} done in {dt:.1f}s ===", flush=True)

    from omr_a2s_multimodal_transformer_tpu.cli import sw_test, test, train, weighted_test

    img_dir = os.path.join(args.workdir, "weights", "image_distorted_kern")
    aud_dir = os.path.join(args.workdir, "weights", "audio_kern")

    stage("train_image", train.main, *common_flags,
          "--input_modality", "image", "--attn_window", "100",
          "--epochs", str(args.epochs), "--patience", "5",
          "--check_val_every_n_epoch", str(args.check_val_every_n_epoch),
          "--batch_size", str(args.image_batch),
          # no --remat: the lane-packed stem fits b8 image activations
          # (multimodal b8 peaks at 12.8 GB without remat and is ~15% faster)
          "--use_flash_cross", "--keep_cache",
          "--weights_dir", img_dir,
          "--run_dir", os.path.join(args.workdir, "runs", "image"))

    stage("train_audio", train.main, *common_flags,
          "--input_modality", "audio", "--attn_window", "100",
          "--epochs", str(args.epochs), "--patience", "5",
          "--check_val_every_n_epoch", str(args.check_val_every_n_epoch),
          "--batch_size", str(args.audio_batch), "--keep_cache",
          "--weights_dir", aud_dir,
          "--run_dir", os.path.join(args.workdir, "runs", "audio"))

    stage("test_image", test.main, *common_flags,
          "--checkpoint_path", os.path.join(img_dir, "best"),
          "--input_modality", "image",
          "--run_dir", os.path.join(args.workdir, "runs", "test_image"))

    stage("sw_fusion", sw_test.main, *common_flags,
          "--image_checkpoint_path", os.path.join(img_dir, "best"),
          "--audio_checkpoint_path", os.path.join(aud_dir, "best"),
          "--run_dir", os.path.join(args.workdir, "runs", "sw"))

    stage("weighted_fusion", weighted_test.main, *common_flags,
          "--image_checkpoint_path", os.path.join(img_dir, "best"),
          "--audio_checkpoint_path", os.path.join(aud_dir, "best"),
          "--alpha", "0.5",
          "--run_dir", os.path.join(args.workdir, "runs", "weighted"))

    # Collect the per-epoch trajectories the Trainer logged.
    for modality in ("image", "audio"):
        path = os.path.join(args.workdir, "runs", modality, "metrics.jsonl")
        rows = []
        if os.path.exists(path):
            with open(path) as f:
                rows = [json.loads(ln) for ln in f if ln.strip()]
        report[f"{modality}_trajectory"] = [
            {k: r[k] for k in ("epoch", "train_loss", "samples_per_sec",
                               "val_sym-er", "val_seq-er") if k in r}
            for r in rows if "epoch" in r
        ]

    out = os.path.join(args.workdir, "report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nreport -> {out}")
    print(json.dumps(report["stages"], indent=1))


if __name__ == "__main__":
    main()
