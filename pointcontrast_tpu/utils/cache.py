"""Persistent XLA compilation cache.

The training-step programs are large (an 8-stage sparse U-Net fwd+bwd jits
to thousands of HLO ops) and the TPU toolchain in this environment compiles
remotely — a fresh compile costs minutes.  Enabling JAX's persistent cache
makes every process after the first start in seconds.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    path = path or os.environ.get(
        "PC_TPU_CACHE_DIR", os.path.expanduser("~/.cache/pointcontrast_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
