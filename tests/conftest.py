"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (the 'fake backend' the reference lacks), and
enable the persistent compilation cache (per-op compiles are slow on this
backend — tests must jit everything and reuse compiled programs)."""

import os

# The container pins JAX_PLATFORMS=axon (remote TPU tunnel) and its
# sitecustomize re-asserts it programmatically — override BOTH.
# OMR_TESTS_TPU=1 keeps the real backend instead: used to run the
# TPU-gated kernel tests (e.g. test_flash_dropout.py real-PRNG cases)
# on actual hardware, where interpret mode can't model the core PRNG.
_ON_TPU = os.environ.get("OMR_TESTS_TPU") == "1"
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# Full-precision matmuls in tests: numerical-equivalence checks (e.g.
# KV-cache vs full forward) need deterministic f32, not the default bf16 passes.
jax.config.update("jax_default_matmul_precision", "highest")
