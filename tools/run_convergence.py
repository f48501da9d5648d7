"""Production-recipe convergence run on synthetic data (VERDICT r2 #3).

The one way (absent real GRANDSTAFF data — zero egress) to catch subtle
numerics bugs in the round-2 fast paths: train the FULL production recipe
— lane-packed stem + Pallas flash-cross attention + dropout 0.1 +
attn_window 100 + bf16, b8 — at real GRANDSTAFF shapes
(361x4412-px images, vocab 6,997, L=1268) on a content-deterministic
synthetic corpus (data/sources.py render_score_image: pixels encode the
tokens, so val/test with DIFFERENT generator seeds measure true
generalization), for hundreds of epochs, and require:

  (a) train loss -> ~0,
  (b) val/test SER descending to a clearly-good value,
  (c) the first-N-epoch loss trajectory matching a no-flash / no-packing
      control run (the reference-identical slow path) within tolerance.

Writes runs/convergence/report.json with both trajectories and the
comparison. Usage:
  python tools/run_convergence.py [--epochs 300] [--train_n 256] [--smoke]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_real_shape_e2e import seed_caches  # noqa: E402


def synth_cfg(n: int, n_eval: int, smoke: bool, n_measures: int = 30, render_style: str = "blob",
              img_height: int = 361, measures_range=None, audio_style: str = "tones") -> str:
    if smoke:
        return json.dumps({
            "n": n, "n_val": n_eval, "n_test": n_eval, "n_measures": 2,
            "img_height_range": [40, 48], "img_width_range": [96, 160],
            "audio_seconds_range": [0.5, 1.0],
        })
    # GRANDSTAFF-shape geometry, scaled by measure count: heights (and thus
    # pitch-step pixel geometry) stay at production values; width/audio
    # length scale with the event count (30 measures = the 4300-4413 px /
    # 17-18.7 s production corpus).
    cfg = {
        "n": n, "n_val": n_eval, "n_test": n_eval,
        "n_measures": n_measures, "render_style": render_style,
        "img_height_range": [img_height - 6, img_height + 1],
        "img_width_range": [int(4300 / 30 * n_measures), int(4413 / 30 * n_measures)],
        "audio_seconds_range": [round(17.0 / 30 * n_measures, 2), round(18.7 / 30 * n_measures, 2)],
    }
    if measures_range:
        cfg["n_measures_range"] = list(measures_range)
    if audio_style != "tones":
        cfg["audio_style"] = audio_style
    return json.dumps(cfg)


def read_trajectory(run_dir: str):
    path = os.path.join(run_dir, "metrics.jsonl")
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            rows = [json.loads(ln) for ln in f if ln.strip()]
    out = {}
    for r in rows:
        if "epoch" in r:
            e = r["epoch"]
            out.setdefault(e, {}).update(
                {k: r[k] for k in ("train_loss", "val_sym-er", "val_seq-er", "samples_per_sec") if k in r}
            )
    return [{"epoch": e, **v} for e, v in sorted(out.items())]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--control_epochs", type=int, default=30,
                   help="no-flash/no-packing control run length (trajectory-shape check)")
    p.add_argument("--train_n", type=int, default=256)
    p.add_argument("--eval_n", type=int, default=64)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--check_val_every_n_epoch", type=int, default=20)
    p.add_argument("--workdir", default="runs/convergence")
    p.add_argument("--skip_control", action="store_true")
    p.add_argument("--no_device_cache", action="store_true",
                   help="stream batches from host every step instead of pinning the corpus "
                        "in HBM (data/device_cache.py; cached is bit-identical and removes "
                        "the dominant per-epoch wall cost behind a remote-TPU link)")
    p.add_argument("--run_name", default="production",
                   help="run/weights subdirectory name (separate recipe variants)")
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--decay_steps", type=int, default=0)
    p.add_argument("--clip_norm", type=float, default=0.0,
                   help="global-norm gradient clipping (post-LN spike guard for lr >= 3e-4)")
    p.add_argument("--encoder_dropout", type=float, default=0.5)
    p.add_argument("--decoder_dropout", type=float, default=0.1)
    p.add_argument("--pos_dropout", type=float, default=0.1)
    p.add_argument("--device_cache_u8", action="store_true",
                   help="uint8 image residency in the device cache (fits 4k full-res samples)")
    p.add_argument("--n_measures", type=int, default=30,
                   help="measures per score; width/audio-length scale with it (30 = production)")
    p.add_argument("--render_style", default="blob", choices=["blob", "grand"],
                   help="image render style (sources.render_score_image)")
    p.add_argument("--audio_style", default="tones", choices=["tones", "bands"],
                   help="audio encoding (sources.render_score_audio): 'tones' is the "
                        "musical-but-aliasing-lossy default; 'bands' is the separable "
                        "exactly-decodable code")
    p.add_argument("--measures_range", nargs=2, type=int, default=None,
                   help="per-sample measure count [lo hi]; width/audio scale with it "
                        "(GRANDSTAFF-realistic mixed lengths — the alignment curriculum)")
    p.add_argument("--img_height", type=int, default=361,
                   help="image height (361 = production; taller stretches the pitch "
                        "pixel geometry — the vertical-resolution probe knob)")
    p.add_argument("--teacher_forcing_prob", type=float, default=0.2)
    p.add_argument("--input_modality", default="image", choices=["image", "audio", "both"])
    p.add_argument("--mixer_residual", action="store_true",
                   help="residual attention mixers (query + CrossAttn), framework addition")
    p.add_argument("--mixer_type", default=None,
                   choices=[None, "concat", "attn_img", "attn_audio", "attn_both"])
    p.add_argument("--smoke", action="store_true", help="tiny shapes, CPU-runnable plumbing check")
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    cache_root = os.path.join(args.workdir, "grandstaff_cache")
    seed_caches(cache_root, smoke=args.smoke)

    common = [
        "--ds_name", "synthetic",
        "--synthetic_config", synth_cfg(args.train_n, args.eval_n, args.smoke, args.n_measures,
                                        args.render_style, args.img_height, args.measures_range,
                                        args.audio_style),
        "--krn_encoding", "kern",
        # NOTE: --use_distorted_images is a dataset-variant selector for
        # HF/directory sources; SyntheticSource has a single clean render,
        # so it only affects the max-lens cache name here.
        "--use_distorted_images",
        "--cache_root", cache_root,
        "--eval_batch_size", str(args.batch),
        "--num_workers", "8",
        "--input_modality", args.input_modality,
        "--attn_window", "100",
        "--batch_size", str(args.batch),
        "--teacher_forcing_prob", str(args.teacher_forcing_prob),
        "--keep_cache",
        "--learning_rate", str(args.learning_rate),
        "--warmup_steps", str(args.warmup_steps),
        "--decay_steps", str(args.decay_steps),
        "--clip_norm", str(args.clip_norm),
        "--encoder_dropout", str(args.encoder_dropout),
        "--decoder_dropout", str(args.decoder_dropout),
        "--pos_dropout", str(args.pos_dropout),
    ]
    if args.mixer_type:
        common += ["--mixer_type", args.mixer_type]
        if args.mixer_residual:
            common += ["--mixer_residual"]
    if not args.no_device_cache:
        common.append("--device_cache")
        if args.device_cache_u8:
            common.append("--device_cache_u8")
    report = {"config": vars(args)}

    from omr_a2s_multimodal_transformer_tpu.cli import train

    def run(name, epochs, extra):
        print(f"\n=== {name} ({epochs} epochs) ===", flush=True)
        run_dir = os.path.join(args.workdir, "runs", name)
        t0 = time.time()
        train.main(common + [
            "--epochs", str(epochs),
            "--patience", "1000000",  # convergence probe: never early-stop
            "--check_val_every_n_epoch", str(args.check_val_every_n_epoch),
            "--weights_dir", os.path.join(args.workdir, "weights", name),
            "--run_dir", run_dir,
        ] + extra)
        report[name + "_wall_s"] = round(time.time() - t0, 1)
        report[name + "_trajectory"] = read_trajectory(run_dir)

    # Control FIRST (shorter): no-flash slow path — plain XLA masked
    # cross-attention. Same data, same seeds, same batch size.
    #
    # Why the control keeps the packed stem: the reference-identical
    # UNPACKED stem cannot run at b8 production shapes on a 16 GB v5e at
    # all — XLA lane-pads the C=16/32 full-resolution activations to 128
    # lanes, needing 34 GB without remat and 23 GB with it (both measured
    # OOM here). The packed stem is instead validated by exact f64 fwd+grad
    # equivalence tests (tests/test_packed_stem.py), so the runtime control
    # isolates the one fast path without an exact-equivalence test: the
    # Pallas flash-cross kernel (+ its in-kernel dropout).
    #
    # --remat (numerics-neutral recompute) is also required for the control:
    # plain XLA cross-attention materializes f32 [b, H, L, S] score tensors
    # (1.94 GB x 8 layers at b8/L1268/S12.7k — measured 25 GB OOM without).
    # Only the flash production path runs remat-free at b8.
    if not args.skip_control:
        run("control", args.control_epochs, ["--remat"])

    # Production recipe: packed stem (default) + flash-cross + dropout 0.1
    # (model default) + bf16 (default). --remat: at this exact config (image
    # modality, single max-width bucket, no remat) the flash bwd kernel's
    # fusion exceeds the 16 MB scoped-VMEM ceiling by 148 KB — remat changes
    # the fusion context and fits; numerics-neutral (grad parity 1.5e-11).
    run(args.run_name, args.epochs, ["--use_flash_cross", "--remat"])

    # Trajectory-shape comparison over the control's epochs. Dropout/PRNG
    # streams differ between the two programs (flash draws in-kernel), so
    # equality is statistical, not bitwise: mean |rel diff| of per-epoch
    # losses must be small once past the noisy first epochs.
    ctrl = report.get("control_trajectory") or []
    prod = report[args.run_name + "_trajectory"]
    if ctrl:
        n = min(len(ctrl), len(prod))
        rels = []
        for c, q in zip(ctrl[2:n], prod[2:n]):
            if "train_loss" in c and "train_loss" in q and c["train_loss"] > 0:
                rels.append(abs(q["train_loss"] - c["train_loss"]) / c["train_loss"])
        report["trajectory_match"] = {
            "epochs_compared": len(rels),
            "mean_rel_loss_diff": round(float(sum(rels) / max(1, len(rels))), 4),
            "max_rel_loss_diff": round(float(max(rels)) if rels else 0.0, 4),
        }

    out = os.path.join(args.workdir, "report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nreport -> {out}")
    last = prod[-1] if prod else {}
    print("final:", json.dumps(last))
    if "trajectory_match" in report:
        print("trajectory match vs control:", json.dumps(report["trajectory_match"]))


if __name__ == "__main__":
    main()


def assemble_report(workdir: str = "runs/convergence", run_name: str = "production"):
    """Rebuild report.json from the runs' metrics.jsonl files (used when
    control and production were executed by separate driver invocations —
    e.g. after a mid-run relaunch; trajectories live in the run dirs).
    Every run subdirectory found is included (so --run_name variants are
    never silently dropped); ``run_name`` picks which one the
    trajectory-match compares against the control."""
    report = {}
    runs_root = os.path.join(workdir, "runs")
    names = sorted(os.listdir(runs_root)) if os.path.isdir(runs_root) else []
    for name in names:
        rd = os.path.join(runs_root, name)
        if os.path.isdir(rd):
            report[name + "_trajectory"] = read_trajectory(rd)
    ctrl = report.get("control_trajectory") or []
    prod = report.get(run_name + "_trajectory") or []
    if ctrl and prod:
        n = min(len(ctrl), len(prod))
        rels = [
            abs(q["train_loss"] - c["train_loss"]) / c["train_loss"]
            for c, q in zip(ctrl[2:n], prod[2:n])
            if "train_loss" in c and "train_loss" in q and c["train_loss"] > 0
        ]
        report["trajectory_match"] = {
            "epochs_compared": len(rels),
            "mean_rel_loss_diff": round(float(sum(rels) / max(1, len(rels))), 4),
            "max_rel_loss_diff": round(float(max(rels)) if rels else 0.0, 4),
        }
    out = os.path.join(workdir, "report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report.get("trajectory_match", {})))
    return report
