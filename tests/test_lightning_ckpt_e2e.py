"""Serialized Lightning .ckpt ingest, end-to-end (VERDICT r1 missing #2).

Builds the reference-architecture torch modules, torch.saves a
Lightning-FORMAT checkpoint file (state_dict + hyper_parameters +
trainer bookkeeping keys, the exact format `load_from_checkpoint`
produces — reference src/train.py:72, src/test.py:62), then drives it
through the real seam: load_torch_checkpoint -> cli.import_torch ->
cli.test on the synthetic corpus, and asserts greedy-token parity
between the torch modules' uncached decode loop and our KV-cached
decoder on the imported weights."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from omr_a2s_multimodal_transformer_tpu.data.dataset import ARDataModule
from omr_a2s_multimodal_transformer_tpu.models import build_model
from omr_a2s_multimodal_transformer_tpu.training.decode import greedy_decode_fn
from omr_a2s_multimodal_transformer_tpu.training.torch_import import load_torch_checkpoint

from test_torch_parity import TDecoder, TEncoder

SYN = dict(n=6, img_height_range=(32, 33), img_width_range=(64, 96),
           audio_seconds_range=(0.3, 0.5), n_measures=1)
SYN_JSON = json.dumps({k: list(v) if isinstance(v, tuple) else v for k, v in SYN.items()})


class TModel(tnn.Module):
    """Reference `Transformer` module paths: encoder.* / decoder.*."""

    def __init__(self, vocab, max_len):
        super().__init__()
        self.encoder = TEncoder()
        self.decoder = TDecoder(vocab, max_len)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("lightning_e2e"))
    cache = os.path.join(tmp, "cache")
    dm = ARDataModule(
        ds_name="synthetic", krn_encoding="kern", input_modality="image",
        batch_size=3, num_workers=1, synthetic=True, synthetic_kwargs=SYN,
        cache_root=cache,
    )
    dm.setup("test")
    vocab = dm.get_vocab()
    max_len = dm.get_max_seq_len()

    torch.manual_seed(7)
    tm = TModel(len(vocab), max_len).eval()
    ckpt_path = os.path.join(tmp, "reference_epoch=3-step=42.ckpt")
    torch.save(
        {
            # the keys a Lightning .ckpt actually contains
            "state_dict": tm.state_dict(),
            "hyper_parameters": {
                "max_seq_len": max_len,
                "input_modality": "image",
                "attn_window": -1,
            },
            "epoch": 3,
            "global_step": 42,
            "pytorch-lightning_version": "2.0.0",
            "optimizer_states": [{}],
            "lr_schedulers": [],
            "loops": {},
        },
        ckpt_path,
    )
    return tmp, cache, dm, vocab, max_len, tm, ckpt_path


def test_load_torch_checkpoint_reads_lightning_format(workspace):
    *_, tm, ckpt_path = workspace
    sd, hp = load_torch_checkpoint(ckpt_path)
    assert "decoder.embedding.weight" in sd
    assert hp["max_seq_len"] > 0 and hp["input_modality"] == "image"


def test_import_cli_then_test_cli(workspace, capsys):
    tmp, cache, dm, vocab, max_len, tm, ckpt_path = workspace
    from omr_a2s_multimodal_transformer_tpu.cli import import_torch, test as test_cli

    out_dir = os.path.join(tmp, "imported")
    import_torch.main(["--torch_ckpt", ckpt_path, "--out", out_dir])
    assert "Imported unimodal checkpoint" in capsys.readouterr().out

    test_cli.main([
        "--ds_name", "synthetic", "--krn_encoding", "kern",
        "--synthetic", "--synthetic_config", SYN_JSON,
        "--cache_root", cache, "--batch_size", "3", "--num_workers", "1",
        "--input_modality", "image", "--checkpoint_path", out_dir,
        "--run_dir", os.path.join(tmp, "run"), "--no_bf16",
    ])
    out = capsys.readouterr().out
    assert "test_sym-er" in out


def test_greedy_token_parity_on_imported_weights(workspace):
    """Our KV-cached greedy decode on the imported weights must emit the
    SAME token stream as the torch modules' uncached full-re-run loop
    (the reference's decode, model.py:170-199)."""
    tmp, cache, dm, vocab, max_len, tm, ckpt_path = workspace
    from omr_a2s_multimodal_transformer_tpu.training.torch_import import (
        convert_unimodal_state_dict,
    )

    sd, hp = load_torch_checkpoint(ckpt_path)
    params = {"params": jax.tree.map(jnp.asarray, convert_unimodal_state_dict(sd))}

    model, _ = build_model({
        "vocab_size": len(vocab), "max_seq_len": max_len,
        "input_modality": "image", "attn_window": -1,
    })
    steps = min(12, max_len)
    sos, eos = vocab.sos_id, vocab.eos_id

    rng = np.random.default_rng(0)
    x = rng.random((1, 32, 48, 1), dtype=np.float32)

    decode = jax.jit(greedy_decode_fn(model, steps, sos, eos))
    ours, _ = decode(params, jnp.asarray(x), None)
    ours = np.asarray(ours)[0]

    with torch.no_grad():
        feats = tm.encoder(torch.tensor(x).permute(0, 3, 1, 2))
        from omr_a2s_multimodal_transformer_tpu.models.positional import positional_encoding_2d

        pe2 = torch.tensor(
            np.asarray(positional_encoding_2d(256, feats.shape[2], feats.shape[3])),
            dtype=feats.dtype,
        ).permute(2, 0, 1)  # [H, W, C] -> [C, H, W] (feats are NCHW)
        mem = (feats + pe2[None]).flatten(2).permute(0, 2, 1)
        y = [sos]
        theirs = []
        for t in range(steps):
            ids = torch.tensor([y])
            causal = tnn.Transformer.generate_square_subsequent_mask(len(y))
            logits = tm.decoder(ids, mem, tgt_mask=causal)  # [B, V, L]
            nxt = int(logits[0, :, -1].argmax())
            theirs.append(nxt)
            y.append(nxt)
            if nxt == eos:
                break
    np.testing.assert_array_equal(ours[: len(theirs)], np.asarray(theirs))
