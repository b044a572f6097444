"""Backend selection that respects JAX_PLATFORMS on hijacked interpreters.

Some TPU environments install a sitecustomize that force-selects the TPU
plugin (``jax.config.update("jax_platforms", "axon,cpu")``) at interpreter
start, overriding the user's ``JAX_PLATFORMS``.  Entry points call
``honor_env_platform()`` before any JAX computation so that e.g.
``JAX_PLATFORMS=cpu python -m pointcontrast_tpu.apps.pretrain ...`` really
runs on CPU (the reference's analogue is torch device selection from CLI
flags, downstream/semseg/main.py).
"""
from __future__ import annotations

import os


def honor_env_platform() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if plat and "axon" not in plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except RuntimeError:
            pass
