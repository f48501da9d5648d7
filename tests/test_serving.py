"""Serving daemon tests: batching correctness (server results == direct
jitted transcriber), bucket routing, concurrency, and the HTTP front.

The reference has no serving stack; these cover the TPU framework's
dynamic-batching layer (serving.py)."""

import functools
import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omr_a2s_multimodal_transformer_tpu.data.vocab import Vocabulary
from omr_a2s_multimodal_transformer_tpu.inference import make_image_transcriber
from omr_a2s_multimodal_transformer_tpu.models.transformer import UnimodalTransformer
from omr_a2s_multimodal_transformer_tpu.serving import TranscriptionServer, serve_http

V, MAXLEN = 19, 8


@functools.lru_cache(maxsize=1)
def _img_model():
    m = UnimodalTransformer(vocab_size=V, max_seq_len=MAXLEN)
    x = jnp.ones((2, 32, 48, 1))
    params = jax.jit(m.init)(
        {"params": jax.random.PRNGKey(0)}, x, None, jnp.ones((2, 4), jnp.int32)
    )
    return m, params


def _vocab():
    return Vocabulary.from_tokens([f"t{i}" for i in range(V - 3)])


def _image(rng, h, w):
    img = np.full((h, w), 255, np.uint8)
    img[h // 4 : h // 2, : w // 2] = rng.integers(0, 255, (h // 2 - h // 4, w // 2), dtype=np.uint8)
    return img


def _make_server(**kw):
    m, params = _img_model()
    kw.setdefault("max_batch", 4)
    kw.setdefault("max_wait_ms", 20.0)
    return TranscriptionServer(
        m, params, "image", vocab=_vocab(),
        image_height=32, image_widths=(48, 96), **kw,
    ), m, params


def test_server_matches_direct_transcriber():
    server, m, params = _make_server()
    try:
        rng = np.random.default_rng(0)
        imgs = [_image(rng, 30, 40), _image(rng, 32, 48), _image(rng, 20, 33)]
        futures = [server.submit(im) for im in imgs]
        results = [f.result(timeout=120) for f in futures]

        # Direct call at the same bucket shapes (48-wide bucket, batch 4).
        direct = make_image_transcriber(m, server.vocab.sos_id, server.vocab.eos_id)
        raw = np.full((4, 32, 48), 255, np.uint8)
        hw = np.ones((4, 2), np.int32)
        for i, im in enumerate(imgs):
            raw[i, : im.shape[0], : im.shape[1]] = im
            hw[i] = im.shape
        tokens, _ = direct(params, jnp.asarray(raw), jnp.asarray(hw))
        tokens = np.asarray(tokens)
        for i, res in enumerate(results):
            row = tokens[i]
            hits = np.nonzero(row == server.vocab.eos_id)[0]
            end = int(hits[0]) + 1 if len(hits) else MAXLEN
            assert res.token_ids == row[:end].tolist()
            assert res.tokens == server.vocab.tokens(res.token_ids)
            assert len(res.scores) == len(res.token_ids)
            assert res.latency_s > 0
    finally:
        server.stop()


def test_bucket_routing_and_batch_padding():
    # Long batching window so one burst lands in one flush deterministically.
    server, _, _ = _make_server(max_batch=8, max_wait_ms=1000.0)
    try:
        rng = np.random.default_rng(1)
        futs = [server.submit(_image(rng, 32, w)) for w in (40, 44, 42, 80, 90)]
        for f in futs:
            f.result(timeout=240)
        stats = server.batch_stats()
        # 3 requests fit the 48 bucket (padded to b4), 2 the 96 bucket (b2)
        assert stats.get("bucket48_b4", 0) >= 1
        assert stats.get("bucket96_b2", 0) >= 1
    finally:
        server.stop()


def test_oversize_request_rejected():
    server, _, _ = _make_server()
    try:
        with pytest.raises(ValueError):
            server.submit(np.zeros((32, 200), np.uint8))
        with pytest.raises(AssertionError):
            server.submit(np.zeros((32,), np.uint8))
    finally:
        server.stop()


def test_concurrent_submitters_all_fulfilled():
    server, _, _ = _make_server(max_batch=8, max_wait_ms=10.0)
    try:
        rng = np.random.default_rng(2)
        images = [_image(rng, 16 + i % 16, 20 + (7 * i) % 70) for i in range(24)]
        results = [None] * len(images)

        def worker(i):
            results[i] = server.transcribe(images[i], timeout=240)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(images))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=240)
        assert all(r is not None for r in results)
        assert all(len(r.token_ids) >= 1 for r in results)
        # determinism: identical payload submitted twice gives identical ids
        a = server.transcribe(images[0]).token_ids
        b = server.transcribe(images[0]).token_ids
        assert a == b
    finally:
        server.stop()


def test_http_front():
    server, _, _ = _make_server()
    httpd = serve_http(server, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    try:
        img = _image(np.random.default_rng(3), 28, 36)
        buf = io.BytesIO()
        np.save(buf, img)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())
        assert out["token_ids"] == server.transcribe(img).token_ids
        assert isinstance(out["tokens"], list)

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=30) as resp:
            health = json.loads(resp.read())
        assert health["ok"]
    finally:
        httpd.shutdown()
        server.stop()


# ------------------------------------------------------------- fused serving


@functools.lru_cache(maxsize=1)
def _audio_model():
    from omr_a2s_multimodal_transformer_tpu.ops.stft import log_spectrogram

    m = UnimodalTransformer(vocab_size=V, max_seq_len=MAXLEN)
    wave = jnp.asarray(np.random.default_rng(7).standard_normal((2, 4096)), jnp.float32)
    spec = log_spectrogram(wave, jnp.asarray([4096, 2048], jnp.int32))
    params = jax.jit(m.init)(
        {"params": jax.random.PRNGKey(1)}, spec[..., None], None,
        jnp.ones((2, 4), jnp.int32),
    )
    return m, params


def _make_fused_server(**kw):
    mi, pi = _img_model()
    ma, pa = _audio_model()
    kw.setdefault("max_batch", 4)
    kw.setdefault("max_wait_ms", 20.0)
    kw.setdefault("alpha", 0.5)
    server = TranscriptionServer(
        mi, pi, "fused", vocab=_vocab(),
        image_height=32, image_widths=(48, 96), audio_samples=(2048, 4096),
        audio_model=ma, audio_params=pa, **kw,
    )
    return server, (mi, pi), (ma, pa)


def test_fused_server_matches_direct_weighted_decode():
    from omr_a2s_multimodal_transformer_tpu.inference import make_fused_transcriber

    # Long batching window so both requests land in one b=2 device call.
    server, (mi, pi), (ma, pa) = _make_fused_server(max_wait_ms=1000.0)
    try:
        rng = np.random.default_rng(4)
        pairs = [
            (_image(rng, 30, 40), rng.standard_normal(1500).astype(np.float32)),
            (_image(rng, 32, 48), rng.standard_normal(2048).astype(np.float32)),
        ]
        futs = [server.submit(p) for p in pairs]
        results = [f.result(timeout=240) for f in futs]

        # Direct call at the server's padded group shape (bucket (48, 2048), b=2).
        direct = make_fused_transcriber(mi, ma, server.vocab.sos_id, server.vocab.eos_id)
        raw = np.full((2, 32, 48), 255, np.uint8)
        hw = np.ones((2, 2), np.int32)
        wave = np.zeros((2, 2048), np.float32)
        ns = np.zeros((2,), np.int32)
        for i, (im, wv) in enumerate(pairs):
            raw[i, : im.shape[0], : im.shape[1]] = im
            hw[i] = im.shape
            wave[i, : wv.shape[0]] = wv
            ns[i] = wv.shape[0]
        tokens, _ = direct(pi, pa, jnp.asarray(raw), jnp.asarray(hw),
                           jnp.asarray(wave), jnp.asarray(ns), 0.5)
        tokens = np.asarray(tokens)
        for i in range(2):
            row = tokens[i]
            hits = np.nonzero(row == server.vocab.eos_id)[0]
            end = int(hits[0]) + 1 if len(hits) else MAXLEN
            assert results[i].token_ids == row[:end].tolist()
        stats = server.batch_stats()
        assert any(k.startswith("bucket48x2048") for k in stats), stats
    finally:
        server.stop()


def test_fused_alpha_changes_decode():
    """alpha=1 must reduce to the image-only decode path (softmax mix with a
    zero audio weight), and a malformed payload is rejected."""
    server, (mi, pi), _ = _make_fused_server()
    try:
        with pytest.raises(AssertionError):
            server.submit(np.zeros((32, 40), np.uint8))  # not a pair
        with pytest.raises(ValueError):
            server.submit((np.zeros((32, 40), np.uint8), np.zeros(9000, np.float32)))
    finally:
        server.stop()

    server1, _, _ = _make_fused_server(alpha=1.0)
    try:
        rng = np.random.default_rng(5)
        img = _image(rng, 32, 48)
        wave = rng.standard_normal(2048).astype(np.float32)
        fused_ids = server1.transcribe((img, wave), timeout=240).token_ids
    finally:
        server1.stop()
    img_server, _, _ = _make_server()
    try:
        img_ids = img_server.transcribe(img, timeout=240).token_ids
    finally:
        img_server.stop()
    assert fused_ids == img_ids


def test_http_front_fused_npz():
    server, _, _ = _make_fused_server()
    httpd = serve_http(server, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    try:
        rng = np.random.default_rng(6)
        img = _image(rng, 28, 36)
        wave = rng.standard_normal(1024).astype(np.float32)
        buf = io.BytesIO()
        np.savez(buf, image=img, wave=wave)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=240) as resp:
            out = json.loads(resp.read())
        assert out["token_ids"] == server.transcribe((img, wave)).token_ids
    finally:
        httpd.shutdown()
        server.stop()
