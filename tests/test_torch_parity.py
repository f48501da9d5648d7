"""Numerical parity vs PyTorch: the reference architecture is rebuilt here
with torch.nn modules (same module paths as the reference state_dict), its
weights are converted through training/torch_import.py, and forward outputs
are compared elementwise. This is the checkpoint-compatibility guarantee:
any reference-trained .ckpt loads into our models with matching numerics.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from omr_a2s_multimodal_transformer_tpu.models.decoder import KernDecoder  # noqa: E402
from omr_a2s_multimodal_transformer_tpu.models.positional import (  # noqa: E402
    positional_encoding_1d,
    positional_encoding_2d,
)
from omr_a2s_multimodal_transformer_tpu.models.transformer import UnimodalTransformer  # noqa: E402
from omr_a2s_multimodal_transformer_tpu.training.torch_import import (  # noqa: E402
    convert_decoder,
    convert_encoder,
    convert_unimodal_state_dict,
)

V = 31
MAXLEN = 12


# ---------------------------------------------------------------------------
# Reference-architecture torch modules (same state_dict paths as the
# reference so the converter prefixes line up; forward = eval-mode dataflow).
# ---------------------------------------------------------------------------


class TDepthSep(tnn.Module):
    def __init__(self, in_c, out_c, stride=(1, 1)):
        super().__init__()
        self.depth_conv = tnn.Conv2d(in_c, in_c, (3, 3), stride=stride, padding=(1, 1), groups=in_c)
        self.point_conv = tnn.Conv2d(in_c, out_c, (1, 1))

    def forward(self, x):
        return self.point_conv(self.depth_conv(x))


class TConvBlock(tnn.Module):
    def __init__(self, in_c, out_c, stride=(1, 1)):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_c, out_c, 3, padding=1)
        self.conv2 = tnn.Conv2d(out_c, out_c, 3, padding=1)
        self.conv3 = tnn.Conv2d(out_c, out_c, (3, 3), padding=(1, 1), stride=stride)
        self.norm = tnn.InstanceNorm2d(out_c, eps=1e-3, track_running_stats=False)

    def forward(self, x):
        x = torch.relu(self.conv1(x))
        x = torch.relu(self.conv2(x))
        x = self.norm(x)
        return torch.relu(self.conv3(x))


class TDSCBlock(tnn.Module):
    def __init__(self, in_c, out_c, stride=(1, 1)):
        super().__init__()
        self.conv1 = TDepthSep(in_c, out_c)
        self.conv2 = TDepthSep(out_c, out_c)
        self.conv3 = TDepthSep(out_c, out_c, stride=stride)
        self.norm = tnn.InstanceNorm2d(out_c, eps=1e-3, track_running_stats=False)

    def forward(self, x):
        x = torch.relu(self.conv1(x))
        x = torch.relu(self.conv2(x))
        x = self.norm(x)
        return self.conv3(x)


class TEncoder(tnn.Module):
    def __init__(self):
        super().__init__()
        specs = [(1, 16, (1, 1)), (16, 32, (2, 2)), (32, 64, (2, 2)), (64, 128, (2, 2)), (128, 128, (2, 1))]
        self.conv_blocks = tnn.ModuleList([TConvBlock(i, o, s) for i, o, s in specs])
        dspecs = [(128, 128), (128, 128), (128, 128), (128, 256)]
        self.dscblocks = tnn.ModuleList([TDSCBlock(i, o) for i, o in dspecs])

    def forward(self, x):
        for b in self.conv_blocks:
            x = b(x)
        for b in self.dscblocks:
            xt = b(x)
            x = x + xt if x.size() == xt.size() else xt
        return x


class TDecoder(tnn.Module):
    def __init__(self, vocab, max_len):
        super().__init__()
        self.embedding = tnn.Embedding(vocab, 256, padding_idx=0)
        self.transformer_decoder = tnn.TransformerDecoder(
            tnn.TransformerDecoderLayer(256, 4, 256, 0.1, batch_first=True), 8
        )
        self.out_layer = tnn.Conv1d(256, vocab, 1)
        pe = torch.tensor(positional_encoding_1d(max_len, 256))
        self.register_buffer("pe", pe)

    def forward(self, tgt_ids, memory, tgt_mask=None, tgt_kpm=None, mem_kpm=None):
        x = self.embedding(tgt_ids) + self.pe[: tgt_ids.shape[1]][None]
        x = self.transformer_decoder(
            tgt=x, memory=memory, tgt_mask=tgt_mask,
            tgt_key_padding_mask=tgt_kpm, memory_key_padding_mask=mem_kpm,
        )
        return self.out_layer(x.permute(0, 2, 1))


@functools.lru_cache(maxsize=2)
def _enc_pair():
    torch.manual_seed(0)
    tenc = TEncoder().eval()
    params = {"params": {"encoder": jax.tree.map(jnp.asarray, convert_encoder(tenc.state_dict(), ""))}}
    return tenc, params


def test_encoder_parity():
    from omr_a2s_multimodal_transformer_tpu.models.encoder import ConvStemEncoder

    tenc, params = _enc_pair()
    # fix converter prefix: state_dict keys here have no 'encoder.' prefix
    x = np.random.default_rng(0).uniform(size=(2, 32, 48, 1)).astype(np.float32)
    with torch.no_grad():
        ref = tenc(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    enc = ConvStemEncoder()
    ours = np.asarray(jax.jit(enc.apply)(
        {"params": params["params"]["encoder"]}, jnp.asarray(x)
    ))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


@functools.lru_cache(maxsize=2)
def _dec_pair():
    torch.manual_seed(1)
    tdec = TDecoder(V, MAXLEN).eval()
    params = {"params": convert_decoder(tdec.state_dict(), "")}
    jdec = KernDecoder(vocab_size=V, max_seq_len=MAXLEN)
    return tdec, jdec, params


def test_decoder_parity_causal():
    tdec, jdec, params = _dec_pair()
    rng = np.random.default_rng(1)
    mem = rng.uniform(-1, 1, size=(2, 18, 256)).astype(np.float32)
    ids = rng.integers(1, V, size=(2, 7))
    causal = tnn.Transformer.generate_square_subsequent_mask(7)
    with torch.no_grad():
        ref = tdec(torch.tensor(ids), torch.tensor(mem), tgt_mask=causal).numpy().transpose(0, 2, 1)
    ours = np.asarray(
        jax.jit(jdec.apply)({"params": params["params"]}, jnp.asarray(ids), jnp.asarray(mem), None)
    )
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_decoder_parity_windowed_with_masks():
    """Windowed causal mask + bool pad masks vs torch (proper -inf semantics)."""
    tdec, jdec, params = _dec_pair()
    jdec_w = KernDecoder(vocab_size=V, max_seq_len=MAXLEN, attn_window=3)
    rng = np.random.default_rng(2)
    mem = rng.uniform(-1, 1, size=(2, 18, 256)).astype(np.float32)
    ids = rng.integers(1, V, size=(2, 7))
    ids[0, 5:] = 0  # pads
    mem_valid = np.ones((2, 18), bool)
    mem_valid[1, 12:] = False

    # torch windowed mask
    L = 7
    tm = torch.full((L, L), float("-inf"))
    for i in range(L):
        tm[i, max(0, i - 3) : i + 1] = 0.0
    with torch.no_grad():
        ref = tdec(
            torch.tensor(ids), torch.tensor(mem), tgt_mask=tm,
            tgt_kpm=torch.tensor(ids == 0), mem_kpm=torch.tensor(~mem_valid),
        ).numpy().transpose(0, 2, 1)
    ours = np.asarray(
        jax.jit(jdec_w.apply)(
            {"params": params["params"]}, jnp.asarray(ids), jnp.asarray(mem), jnp.asarray(mem_valid)
        )
    )
    # positions past a fully-padded row can differ (torch NaNs there); compare valid rows
    np.testing.assert_allclose(ours[:, :5], ref[:, :5], atol=5e-4, rtol=1e-3)


def test_positional_encodings_match_reference_formula():
    # 1D (reference decoder.py:17-27)
    max_len, emb = 20, 256
    pos = torch.arange(max_len).unsqueeze(1)
    den = torch.pow(10000, torch.arange(0, emb, 2) / emb)
    pe = torch.zeros(max_len, emb)
    pe[:, 0::2] = torch.sin(pos / den)
    pe[:, 1::2] = torch.cos(pos / den)
    np.testing.assert_allclose(positional_encoding_1d(max_len, emb), pe.numpy(), atol=1e-6)

    # 2D (reference model.py:29-43), NCHW there vs NHWC here
    c, h, w = 256, 5, 7
    pos_h = torch.arange(h).unsqueeze(1)
    pos_w = torch.arange(w).unsqueeze(1)
    den2 = torch.pow(10000, torch.arange(0, c // 2, 2) / c)
    pe2 = torch.zeros(1, h, w, c)
    pe2[0, :, :, 0 : c // 2 : 2] = torch.sin(pos_w / den2).unsqueeze(0).repeat(h, 1, 1)
    pe2[0, :, :, 1 : c // 2 : 2] = torch.cos(pos_w / den2).unsqueeze(0).repeat(h, 1, 1)
    pe2[0, :, :, c // 2 :: 2] = torch.sin(pos_h / den2).unsqueeze(1).repeat(1, w, 1)
    pe2[0, :, :, (c // 2) + 1 :: 2] = torch.cos(pos_h / den2).unsqueeze(1).repeat(1, w, 1)
    np.testing.assert_allclose(positional_encoding_2d(c, h, w), pe2[0].numpy(), atol=1e-6)


def test_full_unimodal_import_and_greedy_equivalence():
    """End-to-end: convert a full reference-architecture torch model, then
    greedy-decode with both frameworks and compare token streams."""

    class TFull(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = TEncoder()
            self.decoder = TDecoder(V, MAXLEN)

    torch.manual_seed(3)
    tm = TFull().eval()
    params = {"params": convert_unimodal_state_dict(tm.state_dict())}
    jm = UnimodalTransformer(vocab_size=V, max_seq_len=MAXLEN)

    rng = np.random.default_rng(3)
    x = rng.uniform(size=(1, 32, 48, 1)).astype(np.float32)

    # torch greedy (reference loop, full re-run per step)
    with torch.no_grad():
        feats = tm.encoder(torch.tensor(x.transpose(0, 3, 1, 2)))
        pe2 = torch.tensor(positional_encoding_2d(256, feats.shape[2], feats.shape[3]))
        mem = (feats.permute(0, 2, 3, 1) + pe2[None]).flatten(1, 2)
        ids = [1]
        for step in range(MAXLEN):
            t_in = torch.tensor([ids])
            causal = tnn.Transformer.generate_square_subsequent_mask(len(ids))
            logits = tm.decoder(t_in, mem, tgt_mask=causal)
            ids.append(int(logits[0, :, -1].argmax()))
        ref_tokens = ids[1:]

    from omr_a2s_multimodal_transformer_tpu.training.decode import greedy_decode_fn

    decode = jax.jit(greedy_decode_fn(jm, MAXLEN, sos_id=1, eos_id=V - 1))
    tokens, scores = decode(params, jnp.asarray(x), None)
    ours = np.asarray(tokens)[0].tolist()
    # our loop stops at eos (V-1); compare the streams up to that point
    k = ref_tokens.index(V - 1) + 1 if (V - 1) in ref_tokens else MAXLEN
    assert ours[:k] == ref_tokens[:k]


def test_torch_float_mask_parity_mode():
    """torch adds float key-padding masks to the logits instead of masking
    (+1.0 on pads) — the reference trains with that semantics
    (decoder.py:186-189). torch_float_parity=True must reproduce it."""
    tdec, _, params = _dec_pair()
    jdec_parity = KernDecoder(vocab_size=V, max_seq_len=MAXLEN)
    rng = np.random.default_rng(7)
    mem = rng.uniform(-1, 1, size=(2, 12, 256)).astype(np.float32)
    ids = rng.integers(1, V, size=(2, 6))
    ids[0, 4:] = 0
    mem_valid = np.ones((2, 12), bool)
    mem_valid[1, 8:] = False

    causal = tnn.Transformer.generate_square_subsequent_mask(6)
    with torch.no_grad():
        ref = tdec(
            torch.tensor(ids), torch.tensor(mem), tgt_mask=causal,
            tgt_kpm=torch.tensor((ids == 0).astype(np.float32)),      # FLOAT masks:
            mem_kpm=torch.tensor((~mem_valid).astype(np.float32)),    # additive +1.0
        ).numpy().transpose(0, 2, 1)
    ours = np.asarray(
        jax.jit(functools.partial(jdec_parity.apply, torch_float_parity=True))(
            {"params": params["params"]}, jnp.asarray(ids), jnp.asarray(mem), jnp.asarray(mem_valid)
        )
    )
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)
