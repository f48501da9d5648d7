"""Corpus-scale SER table for the decode cache dtypes (VERDICT r2 #2).

The production decode/serving configurations advertise int8/int4 cross-KV
caches; bench.py leads with them. This tool measures what quantization does
to the METRIC the reference evaluates (Sym-ER/Seq-ER, reference
src/utils/metrics.py:75-88): one trained checkpoint (use the convergence
run's best weights — tools/run_convergence.py) decodes the SAME synthetic
test split under every cache_dtype x beam size, on real TPU at production
shapes, and the table lands in reports/cache_dtype_ser.json + STATUS.md.

Usage:
  python tools/eval_cache_dtypes.py --checkpoint runs/convergence/weights/production/best \
      [--workdir runs/convergence] [--eval_n 64] [--beams 1 2] [--smoke]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_convergence import synth_cfg  # noqa: E402
from tools.run_real_shape_e2e import seed_caches  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--workdir", default="runs/cache_dtype_eval")
    p.add_argument("--cache_root", default=None,
                   help="existing seeded cache root (default: <workdir>/grandstaff_cache, seeded here)")
    p.add_argument("--train_n", type=int, default=256,
                   help="MUST match the corpus config the checkpoint was trained with "
                        "(synthetic source derives per-split content from n + split seed)")
    p.add_argument("--eval_n", type=int, default=64)
    p.add_argument("--n_measures", type=int, default=30)
    p.add_argument("--measures_range", nargs=2, type=int, default=None)
    p.add_argument("--render_style", default="blob", choices=["blob", "grand"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtypes", nargs="+", default=["float32", "bfloat16", "int8", "int4"])
    p.add_argument("--beams", nargs="+", type=int, default=[1])
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--out", default=os.path.join("reports", "cache_dtype_ser.json"))
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    cache_root = args.cache_root or os.path.join(args.workdir, "grandstaff_cache")
    if not os.path.isdir(os.path.join(cache_root, "vocabs")):
        seed_caches(cache_root, smoke=args.smoke)

    from omr_a2s_multimodal_transformer_tpu.cli import common
    from omr_a2s_multimodal_transformer_tpu.cli.test import build_parser
    from omr_a2s_multimodal_transformer_tpu.training.loop import Trainer

    rows = []
    for dtype in args.dtypes:
        for beam in args.beams:
            argv = [
                "--ds_name", "synthetic",
                "--synthetic_config", synth_cfg(args.train_n, args.eval_n, args.smoke,
                                                args.n_measures, args.render_style,
                                                measures_range=args.measures_range),
                "--krn_encoding", "kern",
                "--use_distorted_images",
                "--cache_root", cache_root,
                "--eval_batch_size", str(args.batch),
                "--input_modality", "image",
                "--checkpoint_path", args.checkpoint,
                "--cache_dtype", dtype,
                "--beam_size", str(beam),
                "--run_dir", os.path.join(args.workdir, "runs", f"{dtype}_beam{beam}"),
            ]
            a = build_parser().parse_args(argv)
            common.init_cli(a)
            dm = common.make_datamodule(a, a.input_modality)
            dm.setup("test")
            model, params, hp, multimodal = common.build_from_checkpoint(
                a.checkpoint_path, hparams_override={"cache_dtype": dtype})
            trainer = Trainer(
                model, dm.get_vocab(), hp,
                weights_dir=os.path.dirname(a.checkpoint_path) or ".",
                run_dir=a.run_dir, bf16_compute=True, multimodal=multimodal,
                ytest_i2w=dm.test_ds.i2w, beam_size=beam,
            )
            trainer.restore(a.checkpoint_path)
            # Warm the decode program on ONE batch first so wall_s is a clean
            # execution number: compile time (240+ s for the f32/beam-1
            # combination) previously landed in the first row's wall column
            # and made the dtype comparison misleading (VERDICT r3 weak #6).
            t0 = time.time()
            trainer.evaluate([next(iter(dm.test_dataloader()))], name="warmup")
            compile_s = time.time() - t0
            t0 = time.time()
            metrics = trainer.test(dm)
            row = {"cache_dtype": dtype, "beam_size": beam,
                   "wall_s": round(time.time() - t0, 1),
                   "compile_warmup_s": round(compile_s, 1),
                   **{k: round(float(v), 3) for k, v in metrics.items()}}
            rows.append(row)
            print(json.dumps(row), flush=True)

    # Deltas vs the exact float32 greedy decode (the reference semantics).
    ref = next((r for r in rows if r["cache_dtype"] == "float32" and r["beam_size"] == 1), None)
    report = {"rows": rows}
    if ref is not None:
        key = next((k for k in ref if k.endswith("sym-er")), None)
        if key:
            report["deltas_vs_float32_greedy"] = {
                f"{r['cache_dtype']}_beam{r['beam_size']}": round(r[key] - ref[key], 3)
                for r in rows
            }
    out = args.out
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report -> {out}")


if __name__ == "__main__":
    main()
