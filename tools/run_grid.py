"""Miniature reproduction of the reference's experiment grid (VERDICT r3 #2).

The reference's central scientific claim is that multimodal fusion beats
unimodal transcription (reference src/transformer/model.py:358-726; the
3-modality x 4-mixer x late-fusion grid run_experiments.sh:10-85). This
tool trains that grid to convergence on the content-deterministic
synthetic corpus — image-only, audio-only, multimodal (any of the 4
mixers) — then evaluates both late-fusion schemes (Smith-Waterman
alignment fusion and weighted-logit fusion with an alpha sweep) using the
trained unimodal checkpoints, and emits one SER table covering every cell.

Geometry is measure-count scaled (default --n_measures 10 ~= 1/3 of the
production 30-measure GRANDSTAFF shapes) so the full grid fits in a
single-chip wall-clock budget; every model/kernel config is the production
recipe (packed stem + flash cross-attention + bf16 + warmup-cosine).

Usage:
  python tools/run_grid.py [--train_n 1024] [--n_measures 10] [--epochs 150]
      [--legs image audio concat attn_img] [--alphas 0.3 0.5 0.7]

Writes reports/grid_r04.json and prints a markdown table.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_convergence import read_trajectory, synth_cfg  # noqa: E402
from tools.run_real_shape_e2e import seed_caches  # noqa: E402

MIXERS = ("concat", "attn_img", "attn_audio", "attn_both")


def leg_spec(leg: str):
    """leg name -> (input_modality, mixer_type)."""
    if leg in ("image", "audio"):
        return leg, None
    if leg in MIXERS:
        return "both", leg
    raise ValueError(f"unknown leg {leg!r}: use image|audio|{'|'.join(MIXERS)}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="runs/grid")
    p.add_argument("--train_n", type=int, default=1024)
    p.add_argument("--eval_n", type=int, default=128)
    p.add_argument("--n_measures", type=int, default=10)
    p.add_argument("--measures_range", nargs=2, type=int, default=None,
                   help="per-sample measure-count range (varied lengths; GRANDSTAFF-like)")
    p.add_argument("--render_style", default="grand", choices=["blob", "grand"])
    p.add_argument("--audio_style", default="tones", choices=["tones", "bands"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--schedule_epochs", type=int, default=None,
                   help="cosine decay horizon in epochs (default = --epochs). "
                        "r4's production latch recipe decays over 150 epochs; "
                        "training 60 epochs on a 60-epoch cosine halves the LR "
                        "by ep30 and the cross-attention alignment latch "
                        "(which needs sustained LR ~2-3e-4) never happens — "
                        "measured r5: same corpus/recipe, 60-ep schedule stuck "
                        "at val ~44 through ep40 where the 150-ep schedule "
                        "latched by ep30.")
    p.add_argument("--check_val_every_n_epoch", type=int, default=10)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--warmup_epochs", type=int, default=5)
    p.add_argument("--clip_norm", type=float, default=0.0,
                   help="global-norm gradient clipping (1.0 = the measured post-LN spike guard)")
    p.add_argument("--encoder_dropout", type=float, default=0.5)
    p.add_argument("--decoder_dropout", type=float, default=0.1)
    p.add_argument("--pos_dropout", type=float, default=0.1)
    p.add_argument("--teacher_forcing_prob", type=float, default=0.2)
    p.add_argument("--teacher_forcing_modality_prob", type=float, default=0.2,
                   help="modality dropout for mixer legs (reference parity 0.2; "
                        "0 trains the 'both' path only — isolates mixer dynamics "
                        "from the unimodal-branch updates)")
    p.add_argument("--legs", nargs="+", default=["image", "audio", "concat", "attn_img"])
    p.add_argument("--alphas", nargs="+", type=float, default=[0.3, 0.5, 0.7])
    p.add_argument("--skip_fusion", action="store_true")
    p.add_argument("--skip_training", action="store_true",
                   help="reuse existing leg checkpoints; only (re)run tests + fusion")
    p.add_argument("--reuse_existing", action="store_true",
                   help="skip training any leg whose best checkpoint already exists "
                        "(e.g. an image leg pre-seeded from a prior convergence run "
                        "on the identical corpus)")
    p.add_argument("--mixer_residual", action="store_true",
                   help="residual attention mixers (query + CrossAttn) — framework "
                        "addition; pair with --leg_suffix to keep rows distinct")
    p.add_argument("--mixer_train_only", default="",
                   help="freeze all but these top-level param groups in mixer "
                        "legs (e.g. 'cross_attn,mix_gate'; pair with "
                        "--warm_start_mixers: the full fine-tune at mixer LRs "
                        "destroys a strong donor — measured 0.2 -> 21.6 val in "
                        "5 epochs)")
    p.add_argument("--warm_start_mixers", action="store_true",
                   help="initialize mixer legs' encoders+decoder from the trained "
                        "unimodal image/audio leg checkpoints (cross_attn stays fresh); "
                        "shortcuts the cross-modal alignment latch that keeps attention "
                        "mixers in the no-latch basin for 60 epochs from scratch")
    p.add_argument("--leg_suffix", default="",
                   help="suffix appended to mixer leg names in workdir paths and the "
                        "report (e.g. '_warm' to train warm-started legs beside "
                        "from-scratch ones)")
    p.add_argument("--smoke", action="store_true", help="tiny shapes, CPU plumbing check")
    p.add_argument("--out", default="reports/grid_r04.json")
    args = p.parse_args()

    from omr_a2s_multimodal_transformer_tpu.cli import common, train
    from omr_a2s_multimodal_transformer_tpu.cli import sw_test, weighted_test
    from omr_a2s_multimodal_transformer_tpu.cli.test import build_parser as test_parser
    from omr_a2s_multimodal_transformer_tpu.training.loop import Trainer

    os.makedirs(args.workdir, exist_ok=True)
    cache_root = os.path.join(args.workdir, "grandstaff_cache")
    seed_caches(cache_root, smoke=args.smoke)
    cfg = synth_cfg(args.train_n, args.eval_n, args.smoke, args.n_measures, args.render_style,
                    measures_range=args.measures_range, audio_style=args.audio_style)
    steps_per_epoch = max(1, args.train_n // args.batch)

    data_args = [
        "--ds_name", "synthetic",
        "--synthetic_config", cfg,
        "--krn_encoding", "kern",
        "--use_distorted_images",
        "--cache_root", cache_root,
        "--eval_batch_size", str(args.batch),
    ]

    report = {"config": vars(args), "legs": {}, "fusion": {}}

    def best_ckpt(leg):
        return os.path.join(args.workdir, "weights", leg, "best")

    def test_of_best(leg, modality, extra_argv=()):
        """Restore the leg's best checkpoint and run the test split."""
        argv = data_args + [
            "--input_modality", modality,
            "--checkpoint_path", best_ckpt(leg),
            "--run_dir", os.path.join(args.workdir, "runs", leg + "_test"),
            *extra_argv,
        ]
        a = test_parser().parse_args(argv)
        common.init_cli(a)
        dm = common.make_datamodule(a, modality)
        dm.setup("test")
        model, params, hp, multimodal = common.build_from_checkpoint(a.checkpoint_path)
        tr = Trainer(model, dm.get_vocab(), hp,
                     weights_dir=os.path.dirname(a.checkpoint_path), run_dir=a.run_dir,
                     bf16_compute=True, multimodal=multimodal, ytest_i2w=dm.test_ds.i2w)
        tr.restore(a.checkpoint_path)
        return {k: round(float(v), 3) for k, v in tr.test(dm).items()}

    # ---------------------------------------------------------------- legs
    for leg in args.legs:
        modality, mixer = leg_spec(leg)
        name = leg + (args.leg_suffix if mixer else "")
        t0 = time.time()
        if args.reuse_existing and os.path.exists(best_ckpt(name)):
            print(f"\n=== {name}: reusing existing checkpoint ===", flush=True)
        elif not args.skip_training:
            print(f"\n=== train {name} ({args.epochs} epochs) ===", flush=True)
            argv = data_args + [
                "--keep_cache",
                "--input_modality", modality,
                "--attn_window", "100",
                "--batch_size", str(args.batch),
                "--num_workers", "8",
                "--teacher_forcing_prob", str(args.teacher_forcing_prob),
                "--teacher_forcing_modality_prob", str(args.teacher_forcing_modality_prob),
                "--learning_rate", str(args.learning_rate),
                "--warmup_steps", str(args.warmup_epochs * steps_per_epoch),
                "--decay_steps", str((args.schedule_epochs or args.epochs) * steps_per_epoch),
                "--clip_norm", str(args.clip_norm),
                "--encoder_dropout", str(args.encoder_dropout),
                "--decoder_dropout", str(args.decoder_dropout),
                "--pos_dropout", str(args.pos_dropout),
                "--epochs", str(args.epochs),
                "--patience", "1000000",
                "--check_val_every_n_epoch", str(args.check_val_every_n_epoch),
                "--weights_dir", os.path.join(args.workdir, "weights", name),
                "--run_dir", os.path.join(args.workdir, "runs", name),
                "--use_flash_cross", "--remat", "--device_cache", "--device_cache_u8",
            ]
            if mixer:
                argv += ["--mixer_type", mixer]
                if args.mixer_residual:
                    argv += ["--mixer_residual"]
                if args.mixer_train_only:
                    argv += ["--train_only", args.mixer_train_only]
                if args.warm_start_mixers:
                    img_ck, aud_ck = best_ckpt("image"), best_ckpt("audio")
                    if not (os.path.exists(img_ck) and os.path.exists(aud_ck)):
                        raise SystemExit("--warm_start_mixers needs trained image+audio legs "
                                         f"({img_ck}, {aud_ck})")
                    # the decoder donor matches the mixer's memory CONTENT
                    # at init:
                    # - plain reference mixers: the memory is the ATTENDED
                    #   values — attn_audio memories are audio values (at
                    #   image query positions), attn_img the reverse;
                    #   concat/attn_both carry both (stronger image decoder
                    #   donates).
                    # - gated-residual mixers: tanh(0)=0 makes the init
                    #   memory EXACTLY the QUERY modality's memory —
                    #   attn_img starts as the audio-only system (donor
                    #   audio), attn_audio as the image-only system (donor
                    #   image). Getting this right is the whole point of the
                    #   warm+gated combination: the warm decoder free-runs
                    #   correctly from step 0 instead of on fresh-attn noise.
                    if args.mixer_residual:
                        donor = "audio" if mixer == "attn_img" else "image"
                    else:
                        donor = "audio" if mixer == "attn_audio" else "image"
                    argv += ["--init_image_checkpoint", img_ck,
                             "--init_audio_checkpoint", aud_ck,
                             "--init_decoder_from", donor]
            train.main(argv)
        traj = read_trajectory(os.path.join(args.workdir, "runs", name))
        best_val = min((r.get("val_sym-er", 1e9) for r in traj), default=None)
        test_m = test_of_best(name, modality)
        report["legs"][name] = {
            "modality": modality, "mixer": mixer,
            "best_val_sym-er": best_val,
            "trajectory": traj, **test_m,
            "wall_s": round(time.time() - t0, 1),
        }
        print(json.dumps({k: v for k, v in report["legs"][name].items() if k != "trajectory"}),
              flush=True)
        _write(report, args.out)

    # --------------------------------------------------------------- fusion
    have_uni = all(os.path.exists(best_ckpt(m)) for m in ("image", "audio"))
    if not args.skip_fusion and have_uni:
        fusion_common = data_args + [
            "--image_checkpoint_path", best_ckpt("image"),
            "--audio_checkpoint_path", best_ckpt("audio"),
        ]

        def read_last_metrics(run_dir):
            path = os.path.join(run_dir, "metrics.jsonl")
            rows = [json.loads(ln) for ln in open(path) if ln.strip()]
            last = [r for r in rows if any(k.endswith("sym-er") for k in r)][-1]
            return {k: round(float(v), 3) for k, v in last.items()
                    if k not in ("step", "time")}

        rd = os.path.join(args.workdir, "runs", "fusion_sw")
        t0 = time.time()
        sw_test.main(fusion_common + ["--run_dir", rd])
        report["fusion"]["smith_waterman"] = {
            **read_last_metrics(rd), "wall_s": round(time.time() - t0, 1)}
        _write(report, args.out)

        for alpha in args.alphas:
            rd = os.path.join(args.workdir, "runs", f"fusion_w{alpha}")
            t0 = time.time()
            weighted_test.main(fusion_common + ["--alpha", str(alpha), "--run_dir", rd])
            report["fusion"][f"weighted_a{alpha}"] = {
                **read_last_metrics(rd), "wall_s": round(time.time() - t0, 1)}
            _write(report, args.out)

    _write(report, args.out)
    print(f"\nreport -> {args.out}\n")
    print(_markdown(report))


def _write(report, out):
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)


def _markdown(report) -> str:
    lines = ["| system | best val SER | test SER | test seq-ER |",
             "|---|---|---|---|"]
    for leg, r in report["legs"].items():
        lines.append(f"| {leg} | {r.get('best_val_sym-er')} | "
                     f"{r.get('test_sym-er')} | {r.get('test_seq-er')} |")
    for name, r in report["fusion"].items():
        ser = next((v for k, v in r.items() if k.endswith("sym-er")), None)
        seq = next((v for k, v in r.items() if k.endswith("seq-er")), None)
        lines.append(f"| fusion:{name} | — | {ser} | {seq} |")
    return "\n".join(lines)


if __name__ == "__main__":
    main()
