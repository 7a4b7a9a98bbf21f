"""Persistent XLA compilation cache for the CLIs.

Every CLI invocation retraces and recompiles its jit programs from scratch
(~20-240 s of compiles for the train step's shape buckets on TPU); JAX's
persistent compilation cache makes reruns, resumes, and repeated inference
start in seconds instead.  The reference has no equivalent concern — torch
eager has no compile step.

Honors ``JAX_COMPILATION_CACHE_DIR`` when the user sets it; otherwise
defaults to ``~/.cache/glow_tts_train_tpu/jax``.  Must run before the first
jit compilation (any time after import is fine — the cache is consulted at
compile time, not backend init).
"""

import logging
import os
from pathlib import Path

_LOGGER = logging.getLogger("glow_tts_train_tpu")


def enable_compilation_cache() -> None:
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not cache_dir:
        cache_dir = str(Path.home() / ".cache" / "glow_tts_train_tpu" / "jax")
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even sub-second compiles: CLI restarts pay dozens of them
        # (the default threshold of 1.0s would skip most of them)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as exc:  # unwritable home, read-only fs — run uncached
        _LOGGER.debug("compilation cache disabled (%s)", exc)
