"""Benchmark driver. Emits one JSON line per benchmark; the LAST line is the
north-star metric from BASELINE.json: GRANDSTAFF samples/sec/chip for
END-TO-END preprocess+encode+decode at the dataset's true max shapes
(361x4412 distorted score images, L=1268 kern decode, 12,696-token
memories, vocab 6,997 — /root/reference/grandstaff/max_lens/).

Lines:
  {"metric": "train_samples_per_sec_per_chip", ...}        (training step)
  {"metric": "e2e_transcribe_samples_per_sec_per_chip", ...}  <- north star

Every line is self-contained (VERDICT r2 #6): `vs_baseline` is the
DEFENSIBLE ratio — ours vs an *ideal* GPU execution of the reference's own
algorithm (its uncached O(L^2) greedy decode re-runs the full decoder per
token, reference model.py:182-193; `ref_algorithm_tflop_per_sample` counts
those FLOPs from the architecture, and `ideal_gpu_samples_per_sec` is an
A100 running them at a physically impossible 100% MFU @ 312 bf16 TFLOP/s).
Beating 1.0 therefore beats ANY real GPU run of the reference. Each line
also carries its roofline attribution on THIS chip (measured MFU / HBM%,
or % of the decode KV-read bandwidth floor) and, where a torch-CPU
measurement exists, the raw extrapolated CPU ratio under the explicit
label `vs_torch_cpu_extrapolated` (noise-prone: CPU, linear extrapolation
— kept only for continuity with r1/r2 artifacts).

Procedure is pinned for reproducibility: warmup until compiled, then
median of 3 timed blocks; every timing fetches a value that depends on
the computation (the axon backend acks before execution finishes).

Usage: python bench.py [train|decode|e2e]   (default: train then e2e)
"""

import json
import os
import statistics
import sys
import time

TRAIN_CONFIG = {
    "batch": 16,
    "height": 128,
    "width": 1024,
    "seq_len": 256,
    "vocab": 6997,
    "attn_window": 100,
    "steps": 10,
}
# FLAGSHIP training shape: the multimodal production recipe at true
# GRANDSTAFF maxima — image 361x4416 (collated width) + audio 195x808,
# L=1268, concat mixer, flash cross-attention, remat. This is the config
# the perf narrative is about (VERDICT r3 #3); the TRAIN_CONFIG b16 line
# above is kept as the r1-comparable proxy.
FLAGSHIP_TRAIN_CONFIG = {
    "batch": 8,
    "height": 361,
    "width": 4416,
    "audio_height": 195,
    "audio_width": 808,
    "seq_len": 1268,
    "vocab": 6997,
    "attn_window": 100,
    "steps": 5,
}
# True GRANDSTAFF maxima (reference grandstaff/max_lens/ImgDist_ar_w2i_kern.json);
# width is the COLLATED production shape: data/collate.py pads widths to
# multiples of 8, so the 4412-px max image runs at 4416 in every real batch.
E2E_CONFIG = {
    "batch": 8,
    "height": 361,
    "width": 4416,
    "seq_len": 1268,
    "vocab": 6997,
    "attn_window": 100,
    "cache_dtype": "bfloat16",  # exact decode; int8 mode line precedes it
}
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")

# TPU v5e (lite) single-chip peaks used for roofline attribution.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9
# Ideal-GPU yardstick for vs_baseline: A100-SXM bf16 dense peak.
A100_PEAK_BF16_FLOPS = 312e12

D_MODEL, N_LAYERS, FF = 256, 8, 256


def _memory_tokens(cfg) -> int:
    return -(-cfg["height"] // 16) * (-(-cfg["width"] // 8))


def ref_decode_flops_per_sample(cfg) -> float:
    """FLOPs one sample costs under the REFERENCE's greedy decode: the full
    decoder re-runs on the growing prefix for every emitted token with no KV
    cache (reference model.py:182-193), so self/cross projections and scores
    are recomputed from scratch L times. 2 FLOPs per MAC."""
    L, S, d, V = cfg["seq_len"], _memory_tokens(cfg), D_MODEL, cfg["vocab"]
    sum_t = L * (L + 1) / 2.0
    sum_t2 = L * (L + 1) * (2 * L + 1) / 6.0
    per_layer = (
        8 * d * d * sum_t      # self-attn q/k/v/out projections
        + 4 * d * sum_t2       # self-attn scores + apply (full t^2 matmuls)
        + 4 * d * d * sum_t    # cross q + out projections
        + 4 * S * d * d * L    # cross K/V projections, redone EVERY step
        + 4 * S * d * sum_t    # cross scores + apply
        + 4 * d * FF * sum_t   # feed-forward
    )
    classifier = 2 * d * V * sum_t
    return N_LAYERS * per_layer + classifier


def decode_kv_floor_seconds_per_batch(cfg) -> float:
    """Hard decode bandwidth floor on this chip: every step must re-read all
    layers' cross-K/V from HBM (STATUS roofline). Ring self-cache, weights
    and dispatch come on top — so measured/floor < 1 always."""
    bytes_per = {"bfloat16": 2, "float32": 4, "int8": 1, "int4": 0.5}[cfg["cache_dtype"]]
    per_step = N_LAYERS * 2 * _memory_tokens(cfg) * D_MODEL * bytes_per * cfg["batch"]
    return cfg["seq_len"] * per_step / V5E_HBM_BYTES_PER_S


def _jax_setup():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return jax


def _cost_analysis(lowered_compiled) -> dict:
    """flops / bytes from XLA cost analysis (best-effort across jax versions).

    `hlo_gb` is the static HLO traffic total (tools/hlo_bytes.py: result +
    operand bytes of every non-fused top-level instruction) — the honest
    HBM-traffic attribution. Cost-analysis "bytes accessed" counts per-op
    operand bytes including VMEM-resident re-reads inside fusions, so it is
    only an UPPER BOUND on HBM traffic (it read >100% of the roofline in
    BENCH_r03 — self-refuting as an HBM number; VERDICT r3 weak #3)."""
    out = {"flops": 0.0, "bytes": 0.0, "hlo_gb": 0.0}
    try:
        ca = lowered_compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        out["flops"] = float(ca.get("flops", 0.0))
        out["bytes"] = float(ca.get("bytes accessed", 0.0))
    except Exception:
        pass
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.hlo_bytes import grouped

        out["hlo_gb"] = sum(grouped(lowered_compiled.as_text()).values()) / 1e9
    except Exception:
        pass
    return out


def _roofline(cost: dict, step_s: float) -> dict:
    """Self-consistent per-step roofline attribution (VERDICT r3 #3)."""
    r = {}
    if cost.get("flops"):
        r["mfu_pct"] = round(cost["flops"] / step_s / V5E_PEAK_BF16_FLOPS * 100, 1)
        r["xla_tflop_per_step"] = round(cost["flops"] / 1e12, 2)
    if cost.get("hlo_gb"):
        pct = round(cost["hlo_gb"] * 1e9 / step_s / V5E_HBM_BYTES_PER_S * 100, 1)
        # Static HLO traffic counts some VMEM-resident buffers; at small
        # shapes that overcounts real HBM traffic and can exceed the roof
        # (physically impossible as HBM utilization — VERDICT r4 weak #3).
        # Report >100% values only under an honest upper-bound label.
        if pct <= 100.0:
            r["hbm_pct"] = pct
        else:
            r["static_hlo_traffic_pct_of_roof_upper_bound"] = pct
        r["hlo_gb_per_step"] = round(cost["hlo_gb"], 2)
    if cost.get("bytes"):
        r["xla_cost_gb_per_step_upper_bound"] = round(cost["bytes"] / 1e9, 2)
    return r


def bench_jax_train(cfg):
    jax = _jax_setup()
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")  # +30% step (threefry dropout cost)

    from omr_a2s_multimodal_transformer_tpu.models import build_model
    from omr_a2s_multimodal_transformer_tpu.training.train_state import TrainState, adam, make_train_step

    hp = {
        "vocab_size": cfg["vocab"],
        "max_seq_len": cfg["seq_len"],
        "input_modality": "image",
        "attn_window": cfg["attn_window"],
        "packed_stem": True,  # lane-packed stem: numerics-equivalent, ~2x step (ops/packed_conv.py)
    }
    model, _ = build_model(hp)
    b = cfg["batch"]
    batch = {
        "x": jnp.ones((b, cfg["height"], cfg["width"], 1), jnp.float32),
        "x_hw": jnp.asarray([[cfg["height"], cfg["width"]]] * b, jnp.int32),
        "y_in": jnp.ones((b, cfg["seq_len"]), jnp.int32),
        "y_out": jnp.ones((b, cfg["seq_len"]), jnp.int32),
    }
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, batch["x"], batch["x_hw"], batch["y_in"]
    )
    state = TrainState.create(variables["params"], adam(1e-4))
    step = make_train_step(model, vocab_size=cfg["vocab"], bf16_compute=True)
    rng = jax.random.PRNGKey(1)

    cost = {"flops": 0.0, "bytes": 0.0}
    try:
        cost = _cost_analysis(step.lower(state, batch, rng).compile())
    except Exception:
        pass

    state, loss = step(state, batch, rng)  # compile
    _ = float(loss)
    blocks = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(cfg["steps"]):
            state, loss = step(state, batch, rng)
        _ = float(loss)  # value fetch forces the whole chain
        blocks.append(cfg["steps"] * b / (time.perf_counter() - t0))
    sps = statistics.median(blocks)
    return sps, _roofline(cost, b / sps)


def bench_jax_train_flagship(cfg):
    """Production-recipe multimodal train step at true max shapes (the
    35-samples/s config from STATUS/tools/bench_train_max.py, now carried
    by the driver artifact itself — VERDICT r3 #3)."""
    jax = _jax_setup()
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")

    from omr_a2s_multimodal_transformer_tpu.models import build_model
    from omr_a2s_multimodal_transformer_tpu.training.train_state import TrainState, adam, make_train_step

    hp = {
        "vocab_size": cfg["vocab"],
        "max_seq_len": cfg["seq_len"],
        "input_modality": "both",
        "mixer_type": "concat",
        "attn_window": cfg["attn_window"],
        # PRODUCTION config is no-remat: the HBM ledger measured remat 14%
        # slower (+4.3 TF of recompute buys only 1.5 GB of traffic —
        # reports/hbm_ledger.json, VERDICT r4 weak #2). Remat remains the
        # lever that makes larger-than-flagship shapes *fit*, not the
        # flagship recipe.
        "remat": False,
        "use_flash_cross": True,
        "packed_stem": True,
    }
    model, _ = build_model(hp)
    b = cfg["batch"]
    batch = {
        "xi": jnp.ones((b, cfg["height"], cfg["width"], 1), jnp.float32),
        "xi_hw": jnp.asarray([[cfg["height"], cfg["width"]]] * b, jnp.int32),
        "xa": jnp.ones((b, cfg["audio_height"], cfg["audio_width"], 1), jnp.float32),
        "xa_hw": jnp.asarray([[cfg["audio_height"], cfg["audio_width"]]] * b, jnp.int32),
        "y_in": jnp.ones((b, cfg["seq_len"]), jnp.int32),
        "y_out": jnp.ones((b, cfg["seq_len"]), jnp.int32),
    }
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)},
        batch["xi"], batch["xi_hw"], batch["xa"], batch["xa_hw"], batch["y_in"],
    )
    state = TrainState.create(variables["params"], adam(1e-4))
    step = make_train_step(model, vocab_size=cfg["vocab"], bf16_compute=True, multimodal=True)
    rng = jax.random.PRNGKey(1)

    cost = {}
    try:
        cost = _cost_analysis(step.lower(state, batch, rng, "both").compile())
    except Exception:
        pass

    state, loss = step(state, batch, rng, "both")
    _ = float(loss)
    blocks = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(cfg["steps"]):
            state, loss = step(state, batch, rng, "both")
        _ = float(loss)
        blocks.append(cfg["steps"] * b / (time.perf_counter() - t0))
    sps = statistics.median(blocks)
    return sps, _roofline(cost, b / sps)


def bench_jax_e2e(cfg) -> float:
    """North star: raw uint8 images -> on-device preprocess -> encode ->
    KV-cached greedy decode to max_len (no early eos: worst-case length)."""
    jax = _jax_setup()
    import jax.numpy as jnp

    from omr_a2s_multimodal_transformer_tpu.inference import make_image_transcriber
    from omr_a2s_multimodal_transformer_tpu.models import build_model

    hp = {
        "vocab_size": cfg["vocab"],
        "max_seq_len": cfg["seq_len"],
        "input_modality": "image",
        "attn_window": cfg["attn_window"],
        "cache_dtype": cfg["cache_dtype"],
        "packed_stem": True,
    }
    model, _ = build_model(hp)
    b = cfg["batch"]
    raw = jnp.ones((b, cfg["height"], cfg["width"]), jnp.uint8)
    hw = jnp.asarray([[cfg["height"], cfg["width"]]] * b, jnp.int32)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)},
        jnp.ones((b, cfg["height"], cfg["width"], 1), jnp.float32), hw,
        jnp.ones((b, 4), jnp.int32),
    )
    transcribe = make_image_transcriber(model, sos_id=1, eos_id=0)
    tokens, _ = transcribe(params, raw, hw)  # compile
    _ = jax.device_get(tokens)
    blocks = []
    for _ in range(3):
        t0 = time.perf_counter()
        tokens, _ = transcribe(params, raw, hw)
        _ = jax.device_get(tokens)
        blocks.append(b / (time.perf_counter() - t0))
    return statistics.median(blocks)


def bench_torch_train(cfg) -> float:
    """Reference-architecture training step in PyTorch on this host."""
    import torch
    import torch.nn as nn

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from test_torch_parity import TDecoder, TEncoder  # reference-architecture modules

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = TEncoder()
            self.decoder = TDecoder(cfg["vocab"], cfg["seq_len"])

        def forward(self, x, y_in):
            f = self.encoder(x)
            mem = f.flatten(2).permute(0, 2, 1)
            causal = nn.Transformer.generate_square_subsequent_mask(y_in.shape[1])
            return self.decoder(y_in, mem, tgt_mask=causal)

    device = "cuda" if torch.cuda.is_available() else "cpu"
    m = Model().to(device)
    opt = torch.optim.Adam(m.parameters(), lr=1e-4)
    lossf = nn.CrossEntropyLoss(ignore_index=0)
    b = max(2, cfg["batch"] // 4)  # smaller batch; normalize per-sample
    x = torch.ones(b, 1, cfg["height"], cfg["width"], device=device)
    y_in = torch.ones(b, cfg["seq_len"], dtype=torch.long, device=device)
    y_out = torch.ones(b, cfg["seq_len"], dtype=torch.long, device=device)

    def step():
        opt.zero_grad()
        loss = lossf(m(x, y_in), y_out)
        loss.backward()
        opt.step()

    step()  # warmup
    steps = 2 if device == "cpu" else 10
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return steps * b / dt


def bench_torch_e2e(cfg) -> dict:
    """Reference e2e at max shapes on this host: encoder forward once +
    uncached greedy decode cost extrapolated from measured per-step costs
    at several prefix lengths (the reference re-runs the full decoder per
    emitted token, model.py:182-193 — cost(t) ~= a + b*t; summing the fit
    over t=1..L UNDERestimates the true quadratic-with-overheads cost)."""
    import numpy as np
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from test_torch_parity import TDecoder, TEncoder

    torch.set_num_threads(os.cpu_count() or 8)
    enc = TEncoder().eval()
    dec = TDecoder(cfg["vocab"], cfg["seq_len"]).eval()
    x = torch.ones(1, 1, cfg["height"], cfg["width"])
    with torch.no_grad():
        t0 = time.perf_counter()
        f = enc(x)
        mem = f.flatten(2).permute(0, 2, 1)
        t_enc = time.perf_counter() - t0
        import torch.nn as nn

        probe_lens, per_step = [16, 64, 128], []
        for t in probe_lens:
            y = torch.ones(1, t, dtype=torch.long)
            causal = nn.Transformer.generate_square_subsequent_mask(t)
            t0 = time.perf_counter()
            dec(y, mem, tgt_mask=causal)
            per_step.append(time.perf_counter() - t0)
    b_slope, a = np.polyfit(probe_lens, per_step, 1)
    L = cfg["seq_len"]
    t_dec = a * L + b_slope * L * (L + 1) / 2.0
    total = t_enc + t_dec
    return {
        "samples_per_sec": 1.0 / total,
        "encode_s": t_enc,
        "decode_s_extrapolated": t_dec,
        "probe_lens": probe_lens,
        "probe_costs_s": per_step,
    }


def get_baseline(key, cfg, fn) -> dict:
    cache = {}
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            cache = json.load(f)
    entry = cache.get(key)
    if entry and entry.get("config") == cfg:
        return entry
    import torch

    result = fn(cfg)
    if not isinstance(result, dict):
        result = {"samples_per_sec": result}
    entry = {
        "config": cfg,
        **result,
        "framework": "torch-" + torch.__version__,
        "device": "cuda" if torch.cuda.is_available() else "cpu",
    }
    cache[key] = entry
    with open(BASELINE_FILE, "w") as f:
        json.dump(cache, f, indent=1)
    return entry


def bench_decode_tokens(cfg) -> float:
    """Batched KV-cached greedy decode throughput (tokens/sec) at the train
    bench shapes (kept for r1 comparability; `python bench.py decode`)."""
    jax = _jax_setup()
    import jax.numpy as jnp

    from omr_a2s_multimodal_transformer_tpu.models import build_model
    from omr_a2s_multimodal_transformer_tpu.training.decode import greedy_decode_fn

    hp = {
        "vocab_size": cfg["vocab"],
        "max_seq_len": cfg["seq_len"],
        "input_modality": "image",
        "attn_window": cfg["attn_window"],
        "cache_dtype": "bfloat16",
        "packed_stem": True,
    }
    model, _ = build_model(hp)
    b = cfg["batch"]
    x = jnp.ones((b, cfg["height"], cfg["width"], 1), jnp.float32)
    hw = jnp.asarray([[cfg["height"], cfg["width"]]] * b, jnp.int32)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, x, hw, jnp.ones((b, 4), jnp.int32)
    )
    decode = jax.jit(greedy_decode_fn(model, cfg["seq_len"], sos_id=1, eos_id=0))
    tokens, _ = decode(params, x, hw)
    _ = jax.device_get(tokens)
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        tokens, _ = decode(params, x, hw)
    _ = jax.device_get(tokens)
    dt = (time.perf_counter() - t0) / iters
    return b * cfg["seq_len"] / dt


def emit(metric, value, unit, vs, **extra):
    line = {
        "metric": metric,
        "value": round(value, 3),
        "unit": unit,
        "vs_baseline": round(vs, 2) if vs == vs else None,
    }
    for k, v in extra.items():
        if isinstance(v, float):
            v = None if v != v else round(v, 3)
        line[k] = v
    print(json.dumps(line))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode not in ("all", "train", "e2e", "decode"):
        sys.exit(f"unknown mode {mode!r}: use train | e2e | decode (default: all)")
    if mode == "decode":
        cfg = dict(TRAIN_CONFIG)
        tps = bench_decode_tokens(cfg)
        emit("greedy_decode_tokens_per_sec_per_chip", tps,
             f"tokens/s (b{cfg['batch']} {cfg['height']}x{cfg['width']} L{cfg['seq_len']}, KV-cached)",
             float("nan"))
        return

    if mode in ("all", "train"):
        cfg = dict(TRAIN_CONFIG)
        ours, roofline = bench_jax_train(cfg)
        try:
            base = get_baseline("train", cfg, bench_torch_train)
            vs_cpu = ours / base["samples_per_sec"]
        except Exception:
            vs_cpu = float("nan")
        # Defensible baseline: the reference trains batch=1 fp16-mixed on one
        # GPU (run_experiments.sh:13); an IDEAL GPU step is bounded by our
        # own step's algorithmic FLOPs at A100 100% MFU (the reference does
        # strictly more work per sample: full O(L^2) masks, no fusion).
        step_flops = roofline.get("xla_tflop_per_step", 0.0) * 1e12
        ideal_gpu = (A100_PEAK_BF16_FLOPS / step_flops * cfg["batch"]) if step_flops else float("nan")
        emit("train_samples_per_sec_per_chip", ours,
             f"samples/s (b{cfg['batch']} {cfg['height']}x{cfg['width']} L{cfg['seq_len']}; "
             "vs_baseline = ours / ideal-100%-MFU-A100 running the same step FLOPs)",
             ours / ideal_gpu,
             ideal_gpu_samples_per_sec=ideal_gpu,
             vs_torch_cpu_extrapolated=vs_cpu,
             **roofline)

        fcfg = dict(FLAGSHIP_TRAIN_CONFIG)
        ours_f, roofline_f = bench_jax_train_flagship(fcfg)
        step_flops_f = roofline_f.get("xla_tflop_per_step", 0.0) * 1e12
        ideal_gpu_f = (A100_PEAK_BF16_FLOPS / step_flops_f * fcfg["batch"]) if step_flops_f else float("nan")
        emit("flagship_train_samples_per_sec_per_chip", ours_f,
             f"samples/s (PRODUCTION multimodal recipe: b{fcfg['batch']} image "
             f"{fcfg['height']}x{fcfg['width']} + audio {fcfg['audio_height']}x"
             f"{fcfg['audio_width']}, L{fcfg['seq_len']}, concat mixer, flash cross-attn, "
             "no-remat; vs_baseline = ours / ideal-100%-MFU-A100 running the same step FLOPs)",
             ours_f / ideal_gpu_f,
             ideal_gpu_samples_per_sec=ideal_gpu_f,
             **roofline_f)

    if mode in ("all", "e2e"):
        cfg = dict(E2E_CONFIG)
        try:
            base = get_baseline("e2e", cfg, bench_torch_e2e)
            base_sps = base["samples_per_sec"]
        except Exception:
            base_sps = float("nan")
        ref_tflop = ref_decode_flops_per_sample(cfg) / 1e12
        ideal_gpu = A100_PEAK_BF16_FLOPS / (ref_tflop * 1e12)
        # Production-mode line first (int8 cross-KV, SER-validated on the
        # synthetic corpus — STATUS.md); the LAST line stays the exact bf16
        # decode.
        for dtype, last in (("int8", False), (cfg["cache_dtype"], True)):
            dcfg = dict(cfg, cache_dtype=dtype)
            ours = bench_jax_e2e(dcfg)
            floor_s = decode_kv_floor_seconds_per_batch(dcfg)
            pct_floor = floor_s / (cfg["batch"] / ours) * 100
            emit(
                "e2e_transcribe_samples_per_sec_per_chip" + ("" if last else "_int8kv"),
                ours,
                f"samples/s (preprocess+encode+decode, b{cfg['batch']} raw-u8 "
                f"{cfg['height']}x{cfg['width']} -> L{cfg['seq_len']} full decode, {dtype} "
                "cross-KV; vs_baseline = ours / ideal-100%-MFU-A100 running the reference's "
                "uncached decode algorithm)",
                ours / ideal_gpu,
                ideal_gpu_samples_per_sec=ideal_gpu,
                ref_algorithm_tflop_per_sample=ref_tflop,
                pct_of_decode_kv_read_floor=pct_floor,
                vs_torch_cpu_extrapolated=ours / base_sps,
            )


if __name__ == "__main__":
    main()
