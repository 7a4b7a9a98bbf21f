"""Test configuration: force a CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (the JAX-idiomatic fake-backend
equivalent of a fake NCCL cluster — SURVEY.md §4).

Note: the environment's TPU plugin ignores JAX_PLATFORMS, so we force the
platform through jax.config before any backend initializes.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# GLOW_TTS_TEST_TPU=1 keeps the real backend so the TPU-only tests (the
# in-kernel hardware-PRNG dropout paths, which interpret mode cannot
# lower) run on an attached chip:
#   GLOW_TTS_TEST_TPU=1 python -m pytest tests/ -m '' -k inkernel_dropout
if not os.environ.get("GLOW_TTS_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated test runs skip recompilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
