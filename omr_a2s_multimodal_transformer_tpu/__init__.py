"""TPU-native framework for polyphonic piano music transcription.

Re-implements the capabilities of the reference PyTorch-Lightning project
(``mariaalfaroc/omr_a2s_multimodal_transformer``) as an idiomatic JAX / XLA /
Pallas / pjit framework:

- ``data``      — kern tokenizer, image/audio frontends, dataset + batching
- ``models``    — conv-stem encoder, transformer decoder, unimodal/multimodal models
- ``ops``       — TPU compute kernels (attention, instance-norm, STFT, masks, edit distance)
- ``parallel``  — device meshes and sharding rules (dp/tp) for pjit
- ``training``  — jitted train/eval loops, KV-cached decoding, orbax checkpoints
- ``fusion``    — late-fusion inference (Smith-Waterman alignment, weighted logits)
- ``utils``     — metrics (SER/seq-ER/MV2H), seeding, logging
- ``cli``       — train/test/fusion entry points mirroring the reference CLI surface
"""

__version__ = "0.1.0"
