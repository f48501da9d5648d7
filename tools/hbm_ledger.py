"""Per-site HBM traffic ledger of the flagship train step (VERDICT r3 #4).

The flagship multimodal step runs at ~60% of its static-traffic roofline;
this tool decides whether the remaining gap is spendable or irreducible:

1. builds the EXACT flagship step (bench.py's config) with remat on/off,
2. dumps the static per-op-group HBM attribution (tools/hlo_bytes.grouped)
   for each variant to reports/hbm_ledger.json,
3. measures both variants' samples/s, so the remat-vs-traffic tradeoff is
   decided by measurement, not lore (r2 dropped remat pre-merged-bwd;
   for a bandwidth-bound step recompute can be cheaper than store+load).

Usage: python tools/hbm_ledger.py [--steps 20] [--top 40]
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.hlo_bytes import grouped  # noqa: E402

FCFG = {  # bench.py's flagship config (true max shapes)
    "batch": 8, "height": 361, "width": 4416,
    "audio_height": 195, "audio_width": 808,
    "seq_len": 1268, "vocab": 6997, "attn_window": 100,
}


def build_step(remat: bool):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")
    from omr_a2s_multimodal_transformer_tpu.models import build_model
    from omr_a2s_multimodal_transformer_tpu.training.train_state import (
        TrainState, adam, make_train_step)

    hp = {
        "vocab_size": FCFG["vocab"], "max_seq_len": FCFG["seq_len"],
        "input_modality": "both", "mixer_type": "concat",
        "attn_window": FCFG["attn_window"], "remat": remat,
        "use_flash_cross": True, "packed_stem": True,
    }
    model, _ = build_model(hp)
    b = FCFG["batch"]
    batch = {
        "xi": jnp.ones((b, FCFG["height"], FCFG["width"], 1), jnp.float32),
        "xi_hw": jnp.asarray([[FCFG["height"], FCFG["width"]]] * b, jnp.int32),
        "xa": jnp.ones((b, FCFG["audio_height"], FCFG["audio_width"], 1), jnp.float32),
        "xa_hw": jnp.asarray([[FCFG["audio_height"], FCFG["audio_width"]]] * b, jnp.int32),
        "y_in": jnp.ones((b, FCFG["seq_len"]), jnp.int32),
        "y_out": jnp.ones((b, FCFG["seq_len"]), jnp.int32),
    }
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)},
        batch["xi"], batch["xi_hw"], batch["xa"], batch["xa_hw"], batch["y_in"])
    state = TrainState.create(variables["params"], adam(1e-4))
    step = make_train_step(model, vocab_size=FCFG["vocab"], bf16_compute=True,
                           multimodal=True)
    return jax, step, state, batch


def measure(jax, step, state, batch, steps: int):
    rng = jax.random.PRNGKey(1)
    state, loss = step(state, batch, rng, "both")
    _ = float(loss)
    blocks = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss = step(state, batch, rng, "both")
        _ = float(loss)
        blocks.append(steps * FCFG["batch"] / (time.perf_counter() - t0))
    return statistics.median(blocks)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--out", default="reports/hbm_ledger.json")
    p.add_argument("--skip_measure", action="store_true")
    args = p.parse_args()

    report = {"config": FCFG, "variants": {}}
    for remat in (False, True):
        name = "remat" if remat else "noremat"
        jax, step, state, batch = build_step(remat)
        compiled = step.lower(state, batch, jax.random.PRNGKey(1), "both").compile()
        groups = sorted(grouped(compiled.as_text()).items(), key=lambda kv: -kv[1])
        total = sum(b for _, b in groups)
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, list) else cost
        var = {
            "hlo_traffic_gb": round(total / 1e9, 2),
            "cost_analysis_bytes_gb": round(cost.get("bytes accessed", 0) / 1e9, 2),
            "flops_tf": round(cost.get("flops", 0) / 1e12, 2),
            "top_sites": [
                {"site": n, "gb": round(b / 1e9, 3), "pct": round(100 * b / total, 1)}
                for n, b in groups[: args.top]
            ],
        }
        if not args.skip_measure:
            sps = measure(jax, step, state, batch, args.steps)
            var["samples_per_sec"] = round(sps, 2)
            var["ms_per_step"] = round(1000 * FCFG["batch"] / sps, 1)
            var["roof_pct_at_819GBps"] = round(
                100 * (total / 819e9) / (FCFG["batch"] / sps), 1)
        report["variants"][name] = var
        print(json.dumps({k: v for k, v in var.items() if k != "top_sites"}), flush=True)
        for s in var["top_sites"][:20]:
            print(f"  {s['gb']:8.3f} GB {s['pct']:5.1f}%  {s['site']}", flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report -> {args.out}")


if __name__ == "__main__":
    main()
