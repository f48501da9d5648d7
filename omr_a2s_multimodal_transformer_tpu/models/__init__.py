from typing import Dict, Tuple

from omr_a2s_multimodal_transformer_tpu.models.multimodal import MultimodalTransformer
from omr_a2s_multimodal_transformer_tpu.models.transformer import UnimodalTransformer


def build_model(hparams: Dict, mesh=None) -> Tuple[object, bool]:
    """Model factory from an hparams dict (stored in checkpoints).

    Required keys: vocab_size, max_seq_len, input_modality.
    Optional: attn_window, mixer_type, masked_norm, prefix_memory_mask,
    torch_float_parity, dropout knobs.

    ``mesh`` is the device mesh (NOT an hparam — it is machine state, not a
    model property, so it never enters checkpoints): threaded into the flash
    cross-attention kernel, whose shard_map partitioning must be explicit
    rather than sniffed from jax internals (VERDICT r2 #4).
    """
    common = dict(
        mesh=mesh,
        vocab_size=hparams["vocab_size"],
        max_seq_len=hparams["max_seq_len"],
        attn_window=hparams.get("attn_window", -1),
        encoder_dropout=hparams.get("encoder_dropout", 0.5),
        decoder_dropout=hparams.get("decoder_dropout", 0.1),
        pos_dropout=hparams.get("pos_dropout", 0.1),
        masked_norm=hparams.get("masked_norm", False),
        remat=hparams.get("remat", False),
        memory_partition=hparams.get("memory_partition"),
        prefix_memory_mask=hparams.get("prefix_memory_mask", False),
        torch_float_parity=hparams.get("torch_float_parity", False),
        cache_dtype=hparams.get("cache_dtype", "float32"),
        use_flash_cross=hparams.get("use_flash_cross", False),
        packed_stem=hparams.get("packed_stem", False),
        conv_mode=hparams.get("conv_mode", "widened"),
    )
    if hparams["input_modality"] == "both":
        return (
            MultimodalTransformer(mixer_type=hparams.get("mixer_type") or "concat",
                                  mixer_residual=hparams.get("mixer_residual", False),
                                  **common),
            True,
        )
    return UnimodalTransformer(**common), False


__all__ = ["UnimodalTransformer", "MultimodalTransformer", "build_model"]
