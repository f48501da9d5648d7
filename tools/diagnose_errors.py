"""Error-pattern diagnostic for the synthetic-corpus SER plateau (round 4).

Round-3 facts: train loss plateaus ~2.2 (measured WITH 0.5 encoder dropout +
0.2 token corruption + 0.1 decoder/pos dropout) and val Sym-ER plateaus ~46
on 256 AND 1k corpora, at constant 1e-4 AND warmup-cosine 3e-4/5e-4 — while
the oracle decoder (tools/oracle_synth_floor.py) proves the pixels carry the
tokens at ~6 SER. This tool separates the remaining hypotheses by measuring,
with an existing checkpoint:

  (a) TRAIN-set SER vs VAL-set SER (greedy decode, eval mode)
        train ~= val ~= 46  -> underfit (model/optimization ceiling)
        train << val        -> generalization gap (data-limited after all)
  (b) teacher-forced eval-mode loss + next-token accuracy (no corruption,
      no dropout) on train/val batches
        low loss + high acc with bad SER -> exposure bias / decode issue
  (c) token-level aligned diffs of a few val samples
        -> WHAT is wrong: pitch confusions? durations? structure? length?

Usage:
  python tools/diagnose_errors.py --workdir runs/convergence_1k \
      --ckpt runs/convergence_1k/weights/production/best [--train_n 1024]
"""

import argparse
import difflib
import json
import os
import sys
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.run_convergence import synth_cfg  # noqa: E402


def build(args):
    from omr_a2s_multimodal_transformer_tpu.cli import common
    from omr_a2s_multimodal_transformer_tpu.cli import test as test_cli

    cache_root = os.path.join(args.workdir, "grandstaff_cache")
    a = test_cli.build_parser().parse_args([
        "--ds_name", "synthetic",
        "--synthetic_config", synth_cfg(args.train_n, args.eval_n, False,
                                        args.n_measures, args.render_style),
        "--krn_encoding", "kern",
        "--use_distorted_images",
        "--cache_root", cache_root,
        "--batch_size", "8", "--eval_batch_size", "8",
        "--num_workers", "8",
        "--input_modality", "image",
        "--checkpoint_path", args.ckpt,
    ])
    common.init_cli(a)
    dm = common.make_datamodule(a, "image")
    dm.setup("fit")
    model, params, hp, _ = common.build_from_checkpoint(args.ckpt)
    return dm, model, params, hp


def decode_batches(model, params, vocab, loader, n_batches):
    from omr_a2s_multimodal_transformer_tpu.training.decode import cut_at_eos, greedy_decode_fn

    decode = jax.jit(greedy_decode_fn(
        model, max_len=model.max_seq_len, sos_id=vocab.sos_id, eos_id=vocab.eos_id))
    out = []
    for bi, batch in enumerate(loader):
        if bi >= n_batches:
            break
        tokens, _ = decode({"params": params}, jnp.asarray(batch["x"]), jnp.asarray(batch["x_hw"]))
        tokens = jax.device_get(tokens)
        pred_ids, _ = cut_at_eos(tokens, tokens, vocab.eos_id)
        gt_ids, _ = cut_at_eos(batch["y_out"], batch["y_out"], vocab.eos_id)
        for p_row, g_row in zip(pred_ids, gt_ids):
            g_row = [g for g in g_row if g != 0]
            out.append(([vocab.i2w[i] for i in g_row], [vocab.i2w[i] for i in p_row]))
    return out


def tf_eval(model, params, loader, n_batches, pad_id=0):
    """Teacher-forced EVAL-MODE loss + next-token top-1 accuracy."""
    @jax.jit
    def fwd(p, x, x_hw, y_in, y_out):
        logits = model.apply({"params": p}, x, x_hw, y_in, True)
        mask = (y_out != pad_id)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, y_out[..., None], axis=-1)[..., 0]
        loss = (nll * mask).sum() / mask.sum()
        acc = ((logits.argmax(-1) == y_out) & mask).sum() / mask.sum()
        return loss, acc

    losses, accs = [], []
    for bi, batch in enumerate(loader):
        if bi >= n_batches:
            break
        loss, acc = fwd(params, jnp.asarray(batch["x"]), jnp.asarray(batch["x_hw"]),
                        jnp.asarray(batch["y_in"]), jnp.asarray(batch["y_out"]))
        losses.append(float(loss)); accs.append(float(acc))
    return float(np.mean(losses)), float(np.mean(accs))


def ser(pairs):
    from omr_a2s_multimodal_transformer_tpu.utils.metrics import compute_ed_metrics
    gt = [g for g, _ in pairs]
    pr = [p for _, p in pairs]
    return compute_ed_metrics(gt, pr)


def error_census(pairs):
    """Classify aligned token edits across all pairs."""
    cnt = Counter()
    subs = Counter()
    for g, p in pairs:
        sm = difflib.SequenceMatcher(a=g, b=p, autojunk=False)
        for tag, i1, i2, j1, j2 in sm.get_opcodes():
            if tag == "equal":
                cnt["equal"] += i2 - i1
            elif tag == "replace":
                n = max(i2 - i1, j2 - j1)
                cnt["replace"] += n
                for gg, pp in zip(g[i1:i2], p[j1:j2]):
                    subs[(gg, pp)] += 1
            elif tag == "delete":
                cnt["delete"] += i2 - i1
            elif tag == "insert":
                cnt["insert"] += j2 - j1
    return cnt, subs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="runs/convergence_1k")
    ap.add_argument("--ckpt", default="runs/convergence_1k/weights/production/best")
    ap.add_argument("--train_n", type=int, default=1024)
    ap.add_argument("--eval_n", type=int, default=64)
    ap.add_argument("--n_batches", type=int, default=2)
    ap.add_argument("--n_measures", type=int, default=30)
    ap.add_argument("--render_style", default="blob", choices=["blob", "grand"])
    args = ap.parse_args()

    dm, model, params, hp = build(args)
    vocab = dm.get_vocab()
    print(f"vocab={len(vocab)} max_seq_len={model.max_seq_len}", flush=True)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16)
                          if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else jnp.asarray(x), params)

    report = {}
    for split, loader in (("train", dm.train_dataloader()), ("val", dm.val_dataloader())):
        pairs = decode_batches(model, params, vocab, loader, args.n_batches)
        m = ser(pairs)
        loss, acc = tf_eval(model, params, loader, args.n_batches)
        cnt, subs = error_census(pairs)
        report[split] = {
            "n": len(pairs), **{k: round(v, 2) for k, v in m.items()},
            "tf_eval_loss": round(loss, 4), "tf_eval_top1": round(acc, 4),
            "edits": dict(cnt),
            "len_gt_mean": round(np.mean([len(g) for g, _ in pairs]), 1),
            "len_pred_mean": round(np.mean([len(p) for _, p in pairs]), 1),
            "top_subs": [[f"{a}->{b}", c] for (a, b), c in subs.most_common(15)],
        }
        print(split, json.dumps(report[split], indent=1), flush=True)
        if split == "val":
            g, p = pairs[0]
            print("GT  :", " ".join(g[:120]))
            print("PRED:", " ".join(p[:120]))

    out = os.path.join("reports", "diagnose_errors.json")
    os.makedirs("reports", exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("->", out)


if __name__ == "__main__":
    main()
