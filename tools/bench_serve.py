"""Serving-daemon latency/throughput bench (VERDICT r1 item 10).

Closed-loop load against TranscriptionServer at true GRANDSTAFF max
shapes (vocab 6,997; image 361x4412 -> L=1268 full decode; audio
195x808). eos is set out-of-vocab so every request decodes the full
worst-case length — latencies below are ceilings, not averages over
early-exit lengths.

Usage: python tools/bench_serve.py [image|audio|fused|all] [--clients N]
       [--requests N] [--max_batch N] [--cache_dtype int8|bfloat16]
Emits one JSON line per modality:
  {"metric": "serve_image", "p50_ms": ..., "p99_ms": ..., "samples_per_sec": ...}
"""

import argparse
import json
import statistics
import sys
import threading
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def _build_one(modality: str, cache_dtype: str):
    import jax
    import jax.numpy as jnp

    from omr_a2s_multimodal_transformer_tpu.models import build_model

    hp = {
        "vocab_size": 6997,
        "max_seq_len": 1268,
        "input_modality": modality,
        "attn_window": 100,
        "cache_dtype": cache_dtype,
        "packed_stem": True,  # production default (lane-packed stem)
    }
    model, _ = build_model(hp)
    if modality == "image":
        x = jnp.ones((1, 368, 4416, 1), jnp.float32)
    else:
        x = jnp.ones((1, 195, 808, 1), jnp.float32)
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, x, None, jnp.ones((1, 4), jnp.int32)
    )
    return model, params


def build_server(modality: str, max_batch: int, max_wait_ms: float, cache_dtype: str):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_default_prng_impl", "rbg")
    from omr_a2s_multimodal_transformer_tpu.serving import TranscriptionServer

    kw = {}
    if modality == "fused":
        model, params = _build_one("image", cache_dtype)
        audio_model, audio_params = _build_one("audio", cache_dtype)
        kw = dict(image_height=368, image_widths=(2208, 4416),
                  audio_samples=(206848, 413696),
                  audio_model=audio_model, audio_params=audio_params, alpha=0.5)
    else:
        model, params = _build_one(modality, cache_dtype)
        kw = (
            dict(image_height=368, image_widths=(2208, 4416))
            if modality == "image"
            else dict(audio_samples=(206848, 413696))  # ~404 / ~808 frames
        )
    # eos out of vocab -> full worst-case decode every request
    return TranscriptionServer(
        model, params, modality, sos_id=1, eos_id=6997,
        max_batch=max_batch, max_wait_ms=max_wait_ms, **kw,
    )


def make_payload(modality: str, rng: np.random.Generator):
    if modality == "fused":
        return (make_payload("image", rng), make_payload("audio", rng))
    if modality == "image":
        h = int(rng.integers(300, 362))
        w = int(rng.integers(3000, 4413))
        img = np.full((h, w), 255, np.uint8)
        img[:, :: max(1, w // 200)] = 0
        return img
    n = int(rng.integers(300000, 413697))
    return rng.standard_normal(n).astype(np.float32) * 0.1


def run_bench(modality: str, clients: int, requests_per_client: int,
              max_batch: int, max_wait_ms: float, cache_dtype: str):
    server = build_server(modality, max_batch, max_wait_ms, cache_dtype)
    try:
        # Warm the jit cache: one request per (bucket, batch=1..max) is too
        # many programs; warm the common ones (b=max and b=1) per bucket.
        rng = np.random.default_rng(0)
        t0 = time.perf_counter()
        warm = [server.submit(make_payload(modality, rng)) for _ in range(max_batch)]
        for f in warm:
            f.result(timeout=3600)
        server.transcribe(make_payload(modality, rng), timeout=3600)
        print(f"# warmup (compile) {time.perf_counter() - t0:.1f}s", file=sys.stderr)

        lat = []
        lock = threading.Lock()
        t_start = time.perf_counter()

        def client(cid):
            crng = np.random.default_rng(1000 + cid)
            for _ in range(requests_per_client):
                res = server.transcribe(make_payload(modality, crng), timeout=3600)
                with lock:
                    lat.append(res.latency_s)

        threads = [threading.Thread(target=client, args=(i,)) for i in range(clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t_start
        lat_ms = sorted(x * 1e3 for x in lat)
        out = {
            "metric": f"serve_{modality}",
            "p50_ms": round(statistics.median(lat_ms), 1),
            "p99_ms": round(lat_ms[min(len(lat_ms) - 1, int(0.99 * len(lat_ms)))], 1),
            "samples_per_sec": round(len(lat) / wall, 3),
            "clients": clients,
            "requests": len(lat),
            "max_batch": max_batch,
            "cache_dtype": cache_dtype,
            "batches": server.batch_stats(),
        }
        print(json.dumps(out))
        return out
    finally:
        server.stop()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", nargs="?", default="all", choices=["image", "audio", "fused", "all"])
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--requests", type=int, default=4, help="per client")
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--max_wait_ms", type=float, default=30.0)
    p.add_argument("--cache_dtype", default="bfloat16", choices=["bfloat16", "int8", "int4"])
    args = p.parse_args()
    modes = ["image", "audio"] if args.mode == "all" else [args.mode]
    for m in modes:
        run_bench(m, args.clients, args.requests, args.max_batch, args.max_wait_ms,
                  args.cache_dtype)


if __name__ == "__main__":
    main()
