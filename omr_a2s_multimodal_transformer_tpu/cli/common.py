"""Shared CLI plumbing: flag surface mirrors the reference's fire CLIs
(train.py:21-36, test.py:19-26) plus TPU-specific knobs (mesh, bf16,
eval batch size, synthetic corpus for smoke runs)."""

from __future__ import annotations

import argparse
import os
import json
from typing import Dict, Optional

from omr_a2s_multimodal_transformer_tpu.data.dataset import ARDataModule
from omr_a2s_multimodal_transformer_tpu.models import build_model
from omr_a2s_multimodal_transformer_tpu.utils.seed import seed_everything


def add_data_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--ds_name", required=True,
                   help="grandstaff|beethoven|chopin|hummel|joplin|mozart|scarlatti-d|synthetic")
    p.add_argument("--krn_encoding", default="bekern", choices=["kern", "bekern"])
    p.add_argument("--use_distorted_images", action="store_true")
    p.add_argument("--img_height", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--eval_batch_size", type=int, default=None)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--data_root", default=None, help="local grandstaff tree (else HF Hub)")
    p.add_argument("--cache_root", default=None, help="vocab/max-lens cache dir (default ./grandstaff)")
    p.add_argument("--synthetic", action="store_true", help="use the synthetic corpus (smoke runs)")
    p.add_argument("--synthetic_config", default=None,
                   help="JSON dict of SyntheticSource kwargs (smoke runs)")
    p.add_argument("--width_buckets", type=int, default=1,
                   help=">1: geometric width-bucket ladder (fewer padded FLOPs, more XLA programs)")
    p.add_argument("--loader_backend", default="threads", choices=["threads", "grain"])


def add_runtime_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no_bf16", action="store_true", help="disable bf16 compute")
    p.add_argument("--mesh_model", type=int, default=1, help="tensor-parallel mesh axis size")
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--run_dir", default=None)
    p.add_argument("--threefry_prng", action="store_true",
                   help="use threefry instead of the faster rbg PRNG")
    p.add_argument("--cache_dtype", default=None,
                   choices=["float32", "bfloat16", "int8", "int4"],
                   help="override the decode KV-cache dtype from the checkpoint "
                        "hparams; int8/int4 quantize the (write-once) cross K/V "
                        "per-channel to 1/2 / 1/4 the bfloat16 decode HBM traffic "
                        "(int4 is fastest, with a coarser bounded logit error)")


def make_datamodule(args, input_modality: str) -> ARDataModule:
    return ARDataModule(
        ds_name=args.ds_name,
        krn_encoding=args.krn_encoding,
        input_modality=input_modality,
        use_distorted_images=args.use_distorted_images,
        img_height=args.img_height,
        batch_size=args.batch_size,
        eval_batch_size=args.eval_batch_size,
        num_workers=args.num_workers,
        data_root=args.data_root,
        synthetic=args.synthetic or args.ds_name == "synthetic",
        synthetic_kwargs=json.loads(args.synthetic_config) if args.synthetic_config else None,
        cache_root=args.cache_root,
        seed=args.seed,
        loader_backend=args.loader_backend,
        width_buckets=args.width_buckets,
    )


def model_name_from_args(args, input_modality: str, mixer_type: Optional[str]) -> str:
    """Reference checkpoint naming (train.py:107-112)."""
    name = input_modality
    if input_modality == "image" and args.use_distorted_images:
        name += "_distorted"
    if input_modality == "image" and args.img_height is not None:
        name += f"_height{args.img_height}"
    if mixer_type is not None and input_modality == "both":
        name += f"_{mixer_type}"
    name += f"_{args.krn_encoding}"
    return name


def build_from_checkpoint(checkpoint_path: str, ytest_i2w: Optional[Dict] = None,
                          hparams_override: Optional[Dict] = None, mesh=None):
    """Load hparams + params from an orbax checkpoint dir -> (model, params, hparams).

    hparams_override entries (with non-None values) replace the stored
    hparams — e.g. {"cache_dtype": "int8"} switches decode KV quantization
    without retraining (runtime knob, not an architecture change)."""
    from omr_a2s_multimodal_transformer_tpu.training import checkpoint as ckpt_lib

    hp = ckpt_lib.load_hparams(checkpoint_path)
    for k, v in (hparams_override or {}).items():
        if v is not None:
            hp[k] = v
    model, multimodal = build_model(hp, mesh=mesh)
    state = ckpt_lib.restore_checkpoint(checkpoint_path)
    params = state["params"] if "params" in state else state
    return model, params, hp, multimodal


def make_mesh_if_needed(args):
    import jax

    from omr_a2s_multimodal_transformer_tpu.parallel.mesh import make_mesh

    if args.mesh_model > 1 or len(jax.devices()) > 1:
        return make_mesh(model=args.mesh_model)
    return None


def init_cli(args) -> None:
    seed_everything(args.seed)
    import jax

    # Persistent compile cache (first compile of the big train step is
    # minutes; subsequent runs hit the cache).
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser(os.environ.get("JAX_COMPILATION_CACHE", "~/.cache/jax_comp_cache")))
    if not getattr(args, "threefry_prng", False):
        # rbg PRNG: hardware RngBitGenerator instead of threefry — measured
        # +30% train-step throughput (dropout mask generation dominates
        # threefry's int-op cost on the VPU).
        jax.config.update("jax_default_prng_impl", "rbg")


def dump_args(args) -> Dict:
    return {k: v for k, v in vars(args).items() if not k.startswith("_")}


def print_config(title: str, args) -> None:
    print(title)
    print(json.dumps(dump_args(args), indent=2, default=str))
