"""Superseded round-1 per-head flash kernels, kept ONLY as a comparison
baseline for tools/bench_flash_packed.py. The production kernel is
omr_a2s_multimodal_transformer_tpu/ops/flash_packed.py (head-packed: no
64->128 tile padding, in-kernel attention dropout). Not part of the
package; do not import from model code."""
